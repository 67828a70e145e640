package graft.cypher

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Cypher value kernel on Catalyst: a variant struct column encoding the
  * reference's SIValue tagged union (`/root/reference/src/value.h:81-96`),
  * with Cypher ternary comparison/equality and the cross-type global sort
  * order (`value.h:19-41` — enum order MAP < NODE < EDGE < ARRAY < … <
  * STRING < BOOL < NUMERIC < NULL; `SIValue_Order`).
  *
  * Encoding: `struct<t:int, i:long, f:double, s:string, b:boolean,
  * arr:array<scalar-variant>>`; a NULL column IS the Cypher null (so missing
  * property ≡ NULL falls out of `element_at` for free, matching
  * PROPERTY_NOTFOUND, `graph_entity.h:24,76`).
  *
  * Everything here is built from Spark built-ins (`when/struct/…`) — stays
  * inside whole-stage codegen, no UDFs.
  */
object Values {

  // type tags (stored in t)
  val T_INT = 1
  val T_FLOAT = 2
  val T_STRING = 3
  val T_BOOL = 4
  val T_ARRAY = 5
  val T_NODE = 6
  val T_EDGE = 7
  /** lat/lon pair (`value.h:90-93`), encoded in the arr branch as two
    * scalar floats [latitude, longitude].
    */
  val T_POINT = 8
  /** Boxed exotic value: the `s` field carries a tagged-JSON encoding of a
    * value the fixed variant schema can't hold inline — an entity inside a
    * list, a map inside a list, or list nesting past [[MaxNest]]
    * (the reference's SIValue nests arbitrarily, `src/datatypes/array.c`;
    * a fixed Catalyst schema can't). The tagged form reuses the variant
    * field names, so `to_json` of a variant/entity column IS the encoding
    * and `from_json(…, variantType)` unboxes inline-able values. Driver
    * decode parses the JSON back to full values; see
    * [[CypherSession.decodeVariant]].
    */
  val T_BOXED = 9
  /** tag used INSIDE boxed JSON for map values: `{"t":10,"m":{…}}` */
  val T_BOXED_MAP = 10
  // temporal family (extension beyond the reference — see
  // [[graft.cypher.TemporalOps]]); payload lives in (i, f, s):
  /** i = epoch day */
  val T_DATE = 11
  /** i = nano of day */
  val T_LOCALTIME = 12
  /** i = nano of day, f = offset seconds */
  val T_TIME = 13
  /** i = epoch second (UTC-anchored local), f = nano of second */
  val T_LOCALDATETIME = 14
  /** i = epoch second, f = nano of second, s = zone id/offset */
  val T_DATETIME = 15
  /** i = months, f = days, s = "seconds,nanos" (normalized) */
  val T_DURATION = 16

  def isTemporal(v: Column): Column =
    tag(v) >= T_DATE && tag(v) <= T_DURATION

  val scalarFields: Seq[StructField] = Seq(
    StructField("t", IntegerType),
    StructField("i", LongType),
    StructField("f", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType))

  val scalarType: StructType = StructType(scalarFields)

  /** Maximum list nesting depth a variant value carries. The reference's
    * T_ARRAY nests arbitrarily (`src/datatypes/array.c`); a fixed Catalyst
    * schema cannot recurse, so we materialize [[MaxNest]] levels and raise
    * loudly beyond (deeper than any reference test exercises).
    */
  val MaxNest = 3

  /** Variant struct carrying up to `d` levels of list nesting. */
  def nestedType(d: Int): StructType =
    if (d <= 0) scalarType
    else StructType(
      scalarFields :+ StructField("arr", ArrayType(nestedType(d - 1))))

  /** Full variant: scalar branches + [[MaxNest]] levels of list nesting
    * (property VALUES stay primitives/arrays-of-primitives per
    * SI_VALID_PROPERTY_VALUE `value.h:54`; runtime values nest).
    */
  val variantType: StructType = nestedType(MaxNest)

  /** Element type of a top-level list value (one nesting level fewer). */
  val elemType: StructType = nestedType(MaxNest - 1)

  val propsType: DataType = MapType(StringType, variantType)

  /** Multi-label membership: a node's `label` column holds a ':'-joined
    * ORDERED label list (plain name for the single-label common case — the
    * reference's own model, docs/cypher_support.md:11; multi-label is
    * parity-plus for the openCypher surface). True iff the node carries
    * EVERY component of `l` (`(n:A:B)` patterns conjoin).
    */
  def labelHas(fld: Column, l: String): Column =
    l.split(":").filter(_.nonEmpty).toSeq
      .map(p => array_contains(split(fld, ":"), p))
      .reduceOption(_ && _).getOrElse(lit(true)) && fld.isNotNull

  /** The node's label list as a string array ([] when unlabeled). */
  def labelList(fld: Column): Column =
    when(fld.isNull, array().cast(ArrayType(StringType)))
      .otherwise(split(fld, ":"))

  def vNull: Column = lit(null).cast(variantType)

  private def mk(t: Column, i: Column, f: Column, s: Column, b: Column,
      arr: Column): Column =
    struct(t.as("t"), i.cast(LongType).as("i"), f.cast(DoubleType).as("f"),
      s.cast(StringType).as("s"), b.cast(BooleanType).as("b"),
      arr.cast(ArrayType(elemType)).as("arr"))

  private val nI = lit(null).cast(LongType)
  private val nF = lit(null).cast(DoubleType)
  private val nS = lit(null).cast(StringType)
  private val nB = lit(null).cast(BooleanType)
  private val nA = lit(null).cast(ArrayType(elemType))
  private val nA1 = lit(null).cast(ArrayType(nestedType(MaxNest - 2)))

  def vInt(c: Column): Column =
    when(c.isNull, vNull).otherwise(mk(lit(T_INT), c, nF, nS, nB, nA))
  def vFloat(c: Column): Column =
    when(c.isNull, vNull).otherwise(mk(lit(T_FLOAT), nI, c, nS, nB, nA))
  def vStr(c: Column): Column =
    when(c.isNull, vNull).otherwise(mk(lit(T_STRING), nI, nF, c, nB, nA))
  def vBool(c: Column): Column =
    when(c.isNull, vNull).otherwise(mk(lit(T_BOOL), nI, nF, nS, c, nA))
  /** arr must be array<scalar-variant>. */
  def vArr(c: Column): Column =
    when(c.isNull, vNull).otherwise(mk(lit(T_ARRAY), nI, nF, nS, nB, c))

  /** Rebuild a stored variant struct with its type tag re-baked as a
    * LITERAL (GraphStore's monomorphic-key load path): the tag read from
    * parquet is a data column, which blocks the constant-folding that
    * collapses comparisons to native column ops — a key known monomorphic
    * at save time gets its tag restored as a literal so the restored view
    * folds exactly like the in-memory constructors above.
    */
  def vRetag(c: Column, t: Int): Column =
    when(c.isNull, vNull).otherwise(struct(lit(t).as("t"),
      c.getField("i").as("i"), c.getField("f").as("f"),
      c.getField("s").as("s"), c.getField("b").as("b"),
      c.getField("arr").as("arr")))

  /** Boxed value from its tagged-JSON text. */
  def vBoxed(json: Column): Column =
    when(json.isNull, vNull).otherwise(mk(lit(T_BOXED), nI, nF, json, nB, nA))

  /** Boxed LIST-ELEMENT variant at element depth. */
  def sBoxed(json: Column): Column = when(json.isNull, lit(null).cast(elemType))
    .otherwise(struct(lit(T_BOXED).as("t"), nI.as("i"), nF.as("f"),
      json.cast(StringType).as("s"), nB.as("b"), nA1.as("arr")))

  def vPoint(lat: Column, lon: Column): Column =
    when(lat.isNull || lon.isNull, vNull)
      .otherwise(mk(lit(T_POINT), nI, nF, nS, nB,
        array(sFloat(lat), sFloat(lon))))
  def pointLat(v: Column): Column = element_at(v.getField("arr"), 1).getField("f")
  def pointLon(v: Column): Column = element_at(v.getField("arr"), 2).getField("f")

  /** Scalar-branch LIST ELEMENT variants (type [[elemType]]). */
  def sInt(c: Column): Column = when(c.isNull, lit(null).cast(elemType))
    .otherwise(struct(lit(T_INT).as("t"), c.cast(LongType).as("i"),
      nF.as("f"), nS.as("s"), nB.as("b"), nA1.as("arr")))
  def sFloat(c: Column): Column = when(c.isNull, lit(null).cast(elemType))
    .otherwise(struct(lit(T_FLOAT).as("t"), nI.as("i"),
      c.cast(DoubleType).as("f"), nS.as("s"), nB.as("b"), nA1.as("arr")))
  def sStr(c: Column): Column = when(c.isNull, lit(null).cast(elemType))
    .otherwise(struct(lit(T_STRING).as("t"), nI.as("i"), nF.as("f"),
      c.cast(StringType).as("s"), nB.as("b"), nA1.as("arr")))

  /** Rebuild a depth-`d` value at depth `d+1` — same value, one more
    * nesting slot (free for the scalar branches, a transform per level
    * for the list branch).
    */
  private def up(c: Column, d: Int): Column =
    when(c.isNull, lit(null).cast(nestedType(d + 1))).otherwise(struct(
      c.getField("t").as("t"), c.getField("i").as("i"),
      c.getField("f").as("f"), c.getField("s").as("s"),
      c.getField("b").as("b"),
      (if (d == 0) lit(null).cast(ArrayType(scalarType))
       else transform(c.getField("arr"), e => up(e, d - 1))).as("arr")))

  /** Rebuild a depth-`d` value at depth `d-1`; a list (or point) at the
    * truncation floor cannot be represented and raises the loud
    * depth-limit error instead of silently dropping data.
    */
  private def down(c: Column, d: Int): Column = {
    val t0 =
      if (d == 1)
        when(c.getField("arr").isNotNull,
          raise_error(lit(s"nested list values exceed the supported " +
            s"nesting depth ($MaxNest)")).cast(IntegerType))
          .otherwise(c.getField("t"))
      else c.getField("t")
    val fields = Seq(t0.as("t"),
      c.getField("i").as("i"), c.getField("f").as("f"),
      c.getField("s").as("s"), c.getField("b").as("b")) ++
      (if (d == 1) Nil
       else Seq(transform(c.getField("arr"), e => down(e, d - 1)).as("arr")))
    when(c.isNull, lit(null).cast(nestedType(d - 1)))
      .otherwise(struct(fields: _*))
  }

  /** Snap a Column to a single Catalyst-expression node. Combinator
    * type-dispatch (`tag(v) === T_INT` …) triggers Spark 4's
    * `Column.equals`, which normalizes (copies) both operand trees on
    * EVERY `===`; a snapped node computes `normalized` once and caches it
    * per instance, so repeated dispatch on the same operand is O(1).
    */
  def snap(c: Column): Column =
    org.apache.spark.sql.GraftColumn.column(
      org.apache.spark.sql.GraftColumn.expression(c))

  /** Widen a list-element variant to the full variant type. */
  def widen(c: Column): Column = snap(up(c, MaxNest - 1))

  /** Narrow a full variant to a list element (one nesting level fewer;
    * values already nested to the floor raise).
    */
  def narrow(c: Column): Column = down(c, MaxNest)

  // ── accessors ─────────────────────────────────────────────────────────────
  def tag(v: Column): Column = v.getField("t")
  def isNum(v: Column): Column = tag(v) === T_INT || tag(v) === T_FLOAT
  /** numeric view (int widened to double). */
  def num(v: Column): Column =
    when(tag(v) === T_INT, v.getField("i").cast(DoubleType))
      .when(tag(v) === T_FLOAT, v.getField("f"))

  // ── equality & comparison (ternary logic) ────────────────────────────────
  // The ternary-logic trees below reference their operands ~30 times; a
  // non-trivial operand (`element_at(props, k)` under a disjunctive WHERE,
  // after predicate pushdown inlines the scan's flat-column alias) would
  // otherwise be re-generated at every reference — the MatchWhere1 [10]
  // TCK shape produced 1.8 MB of Java and fell past Janino's 64 KB method
  // limit into interpreted eval. [[graft.plans.ConditionCseRule]] (preCBO,
  // i.e. AFTER pushdown can no longer undo it) let-binds the repeated
  // subtrees via Catalyst's `With`/CommonExpressionDef.

  /** Cypher `=`: null if either operand null; numerics cross-compare; same
    * type compares natively; differing types → false.
    *
    * Dispatches to the native [[graft.plans.VariantEq]] expression — each
    * operand is evaluated ONCE and the compare is one JIT method whose
    * scalar tag pairs are inline primitive codegen (no boxing, no virtual
    * dispatch on the hot branches). The composed-tree alternative
    * references each operand ~30 times: an adaptive construction-time
    * dispatch to the tree for "cheap" operands was tried in round 10 and
    * REVERTED — an attribute operand is routinely a scan-level alias for
    * `element_at(props, k)` that `PushDownPredicates` re-inlines at every
    * reference, and the fuzz corpus measured 87 queries falling past
    * Janino's 64 KB limit into interpreted eval (the exact disease the
    * native expression cures; r9 baseline: 0). Cheapness at Column-build
    * time cannot see what pushdown will substitute later, so the
    * structural single-evaluation guarantee wins. The composed tree lives
    * on in [[eqTree]] as the executable specification: VariantEqSpec
    * asserts the two agree on a generated value corpus.
    */
  def eq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn.column(graft.plans.VariantEq(
      GraftColumn.expression(a), GraftColumn.expression(b)))
  }

  /** The composed-Column reference implementation of [[eq]] (see there). */
  def eqTree(a: Column, b: Column): Column = {
    val bothInt = tag(a) === T_INT && tag(b) === T_INT
    val bothFloat = tag(a) === T_FLOAT && tag(b) === T_FLOAT
    val bothNum = isNum(a) && isNum(b)
    // mixed int/float equality must not lose precision to the double
    // widening (2^53+1 != 2^53.0): require the float to round-trip the
    // integer exactly
    val ia = when(tag(a) === T_INT, a.getField("i")).otherwise(b.getField("i"))
    val fb = when(tag(a) === T_INT, b.getField("f")).otherwise(a.getField("f"))
    // guard only where double→long cast saturation starts (≥ 2^63):
    // 9.223372036854775e18 is the largest double below 2^63, so every
    // in-range long remains comparable via the round-trip check
    val mixedEq = when(abs(fb) > 9.223372036854775e18, lit(false))
      .otherwise(ia.cast(DoubleType) === fb && ia === fb.cast(LongType))
    // NaN equals nothing, including itself (Cypher IEEE semantics; Spark's
    // `===` treats NaN = NaN as true, so guard explicitly)
    val anyNaN = (tag(a) === T_FLOAT && isnan(a.getField("f"))) ||
      (tag(b) === T_FLOAT && isnan(b.getField("f")))
    when(a.isNull || b.isNull, nB)
      .when((isNum(a) && isNum(b)) && anyNaN, lit(false))
      .when(bothInt, a.getField("i") === b.getField("i"))
      .when(bothFloat, a.getField("f") === b.getField("f"))
      .when(bothNum, mixedEq)
      .when(tag(a) =!= tag(b), lit(false))
      // boxed values (entities/maps/deep lists in lists): the tagged-JSON
      // text is canonical for a given construction path, so text equality
      // is value equality
      .when(tag(a) === T_STRING || tag(a) === T_BOXED,
        a.getField("s") === b.getField("s"))
      .when(tag(a) === T_BOOL, a.getField("b") === b.getField("b"))
      .when(tag(a) === T_ARRAY,
        listPairEq(a.getField("arr"), b.getField("arr"), scalarEq))
      // temporal equality: instants compare zone-insensitively (i, f);
      // times by offset-normalized nano-of-day; durations by normalized
      // components (canonical s text)
      .when(tag(a) === T_DATE || tag(a) === T_LOCALTIME,
        a.getField("i") === b.getField("i"))
      .when(tag(a) === T_TIME, timeEff(a) === timeEff(b))
      .when(tag(a) === T_LOCALDATETIME || tag(a) === T_DATETIME,
        a.getField("i") === b.getField("i") &&
          a.getField("f") === b.getField("f"))
      .when(tag(a) === T_DURATION,
        a.getField("i") === b.getField("i") &&
          a.getField("f") === b.getField("f") &&
          a.getField("s") === b.getField("s"))
      .otherwise(a === b)
  }

  /** offset-normalized time-of-day (nanos, as double — exact: <2^47). */
  private def timeEff(v: Column): Column =
    v.getField("i").cast(DoubleType) - v.getField("f") * 1e9d

  /** Ternary pairwise list equality: length mismatch → false, any element
    * pair definitely unequal → false, else any null comparison → null,
    * else true (TCK List3/List5 null semantics).
    */
  private def listPairEq(ea: Column, eb: Column,
      elemEq: (Column, Column) => Column): Column = {
    val pair = zip_with(ea, eb, (x, y) => elemEq(x, y))
    when(ea.isNull || eb.isNull, nB)
      .when(size(ea) =!= size(eb), lit(false))
      .when(exists(pair, p => !coalesce(p, lit(true))), lit(false))
      .when(exists(pair, p => p.isNull), nB)
      .otherwise(lit(true))
  }

  def neq(a: Column, b: Column): Column = !eq(a, b)

  /** Cypher `<`: null if either null OR types incomparable
    * (`SI_VALUES_ARE_COMPARABLE`, `value.h:60`; DISJOINT → null).
    */
  /** code → boolean via a 4-slot array lookup so the comparator subtree
    * appears ONCE in the when-branch, not once per compared-against code.
    * The code comes from the native recursive comparator
    * ([[graft.plans.VariantArrayCmp]] ≡ `SIArray_Compare`,
    * `/root/reference/src/value.c:455`): nested-list elements recurse to
    * the schema depth instead of comparing as incomparable.
    */
  private def arrayLtBool(a: Column, b: Column, codeToBool: Seq[Any]): Column = {
    import org.apache.spark.sql.GraftColumn
    val code = GraftColumn.column(graft.plans.VariantArrayCmp(
      GraftColumn.expression(a.getField("arr")),
      GraftColumn.expression(b.getField("arr"))))
    element_at(
      array(codeToBool.map(v => lit(v).cast(BooleanType)): _*),
      code + 1)
  }

  /** NaN is unordered: every <,<=,>,>= against it is false (IEEE / TCK
    * Comparison2 [5]; Spark instead sorts NaN above all doubles).
    */
  private def numNaN(a: Column, b: Column): Column =
    (tag(a) === T_FLOAT && isnan(a.getField("f"))) ||
      (tag(b) === T_FLOAT && isnan(b.getField("f")))

  def lt(a: Column, b: Column): Column = {
    val bothNum = isNum(a) && isNum(b)
    when(a.isNull || b.isNull, nB)
      .when(bothNum && numNaN(a, b), lit(false))
      .when(bothNum, num(a) < num(b))
      .when(tag(a) =!= tag(b), nB)
      .when(tag(a) === T_STRING, a.getField("s") < b.getField("s"))
      .when(tag(a) === T_BOOL, a.getField("b") < b.getField("b"))
      // codes: 0 equal, 1 a<b, 2 a>b, 3 incomparable→null
      .when(tag(a) === T_ARRAY,
        arrayLtBool(a, b, Seq(false, true, false, null)))
      .when(tag(a) === T_DATE || tag(a) === T_LOCALTIME,
        a.getField("i") < b.getField("i"))
      .when(tag(a) === T_TIME, timeEff(a) < timeEff(b))
      .when(tag(a) === T_LOCALDATETIME || tag(a) === T_DATETIME,
        (a.getField("i") < b.getField("i")) ||
          (a.getField("i") === b.getField("i") &&
            a.getField("f") < b.getField("f")))
      // durations are not orderable → fall to null
      .otherwise(nB)
  }
  def lte(a: Column, b: Column): Column = {
    val bothNum = isNum(a) && isNum(b)
    when(a.isNull || b.isNull, nB)
      .when(bothNum && numNaN(a, b), lit(false))
      .when(bothNum, num(a) <= num(b))
      .when(tag(a) =!= tag(b), nB)
      .when(tag(a) === T_STRING, a.getField("s") <= b.getField("s"))
      .when(tag(a) === T_BOOL, a.getField("b") <= b.getField("b"))
      .when(tag(a) === T_ARRAY,
        arrayLtBool(a, b, Seq(true, true, false, null)))
      .when(tag(a) === T_DATE || tag(a) === T_LOCALTIME,
        a.getField("i") <= b.getField("i"))
      .when(tag(a) === T_TIME, timeEff(a) <= timeEff(b))
      .when(tag(a) === T_LOCALDATETIME || tag(a) === T_DATETIME,
        (a.getField("i") < b.getField("i")) ||
          (a.getField("i") === b.getField("i") &&
            a.getField("f") <= b.getField("f")))
      .otherwise(nB)
  }
  def gt(a: Column, b: Column): Column = lt(b, a)
  def gte(a: Column, b: Column): Column = lte(b, a)

  /** Global-order type rank (openCypher CIP total order ≡ `value.h:19-41`
    * enum: MAP < NODE < RELATIONSHIP < LIST < PATH < temporals < STRING <
    * BOOLEAN < NUMBER < NULL). BOXED values (entities/maps/paths inside
    * variants) rank by the tag inside their JSON encoding — an untagged
    * JSON object is a boxed path (`{"nodes":…,"rels":…}`).
    */
  private def rankOf(v: Column): Column = {
    val bt = get_json_object(v.getField("s"), "$.t").cast(IntegerType)
    when(tag(v) === T_BOXED,
      when(bt === T_BOXED_MAP, 0)
        .when(bt === T_NODE, 1)
        .when(bt === T_EDGE, 2)
        .when(bt === T_ARRAY, 3)
        .otherwise(4)) // path
      .when(tag(v) === T_NODE, 1)
      .when(tag(v) === T_EDGE, 2)
      .when(tag(v) === T_ARRAY, 3)
      .when(tag(v) === T_DATETIME, 5)
      .when(tag(v) === T_LOCALDATETIME, 6)
      .when(tag(v) === T_DATE, 7)
      .when(tag(v) === T_TIME, 8)
      .when(tag(v) === T_LOCALTIME, 9)
      .when(tag(v) === T_DURATION, 10)
      .when(tag(v) === T_STRING, 11)
      .when(tag(v) === T_BOOL, 12)
      .otherwise(13) // numerics
  }

  /** Within-rank numeric sort magnitude: the numeric value itself,
    * temporals' primary instant/anchor (durations: months-biased
    * approximation; the s text tiebreaks), boxed entities' id.
    */
  private def numOf(v: Column): Column =
    when(tag(v) === T_DATE || tag(v) === T_LOCALTIME,
      v.getField("i").cast(DoubleType))
      .when(tag(v) === T_TIME, timeEff(v))
      .when(tag(v) === T_LOCALDATETIME || tag(v) === T_DATETIME,
        v.getField("i").cast(DoubleType) + v.getField("f") / 1e9d)
      .when(tag(v) === T_DURATION,
        v.getField("i") * 2629746d + v.getField("f") * 86400d)
      .when(tag(v) === T_BOXED,
        // boxed MAPS magnitude-order by key count (Map_Compare's first
        // tier, map.c:208); same-count maps tiebreak on the canonical
        // key-sorted JSON in `s` — keys compare exactly, values
        // lexicographically (a numeric-value divergence the typed
        // map-struct path [Translator.mapOrderKey] does not have).
        // Boxed entities order by id.
        when(get_json_object(v.getField("s"), "$.t") ===
            T_BOXED_MAP.toString,
          size(json_object_keys(get_json_object(v.getField("s"), "$.m")))
            .cast(DoubleType))
          .otherwise(
            get_json_object(v.getField("s"), "$.id").cast(DoubleType)))
      .otherwise(num(v))

  /** Rank a NULL sorts with inside a composite (list element): above every
    * value type, so `[1, null]` < `[null, 1]` and DESC is the exact
    * reverse (Spark's own array ordering would put null elements FIRST).
    */
  val NullRank = 14

  /** Sort-key struct type with `d` levels of list-element nesting. */
  private[cypher] def keyType(d: Int): StructType = {
    val base = Seq(
      StructField("r", IntegerType), StructField("n", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType))
    StructType(
      if (d <= 0) base
      else base :+ StructField("a", ArrayType(keyType(d - 1))))
  }

  /** One-level-down semantic mini-key for a JSON-boxed map VALUE
    * (a Spark `variant`, so string/number/bool/object/array keep their
    * JSON types): same rank scheme as the top level, numerics by value,
    * nested objects count-first with canonical-JSON tiebreak. This is
    * what makes same-key-count boxed maps order like the reference's
    * recursive Map_Compare (`map.c:208-246`) instead of
    * JSON-lexicographically ({x:2} < {x:10}).
    */
  private def variantMiniKey(e: Column, d: Int, cd: Int): Column = {
    // schema_of_variant returns the PARAMETERIZED form for composites
    // ("OBJECT<a: BIGINT>", "ARRAY<BIGINT>", "OBJECT<>") — prefix-match
    // them; scalars ("STRING", "BOOLEAN", "VOID") are exact
    val sch = schema_of_variant(e)
    val isObj = sch.startsWith("OBJECT")
    val isArr = sch.startsWith("ARRAY")
    val txt = e.cast(StringType)
    val r = when(isObj, 0)
      .when(isArr, 3)
      .when(sch === "STRING", 11)
      .when(sch === "BOOLEAN", 12)
      .when(sch === "VOID", NullRank)
      .otherwise(13)
    val n = when(isObj,
        size(json_object_keys(txt)).cast(DoubleType))
      .when(sch === "BOOLEAN",
        try_variant_get(e, "$", "boolean").cast(DoubleType))
      .when(sch === "VOID" || isArr, lit(null).cast(DoubleType))
      .otherwise(try_variant_get(e, "$", "double"))
    // composites with semantic budget (cd > 0) compare via `a` — raw JSON
    // in `s` would tiebreak values lexicographically first
    // ({x:2} > {x:10}); with the budget exhausted the JSON text is the
    // remaining deterministic approximation
    val sNull =
      if (d > 0 && cd > 0) sch === "BOOLEAN" || sch === "VOID" || isObj || isArr
      else sch === "BOOLEAN" || sch === "VOID"
    val s = when(sNull, lit(null).cast(StringType)).otherwise(txt)
    val fields = Seq(r.as("r"), n.as("n"), s.as("s"),
      lit(null).cast(BooleanType).as("b")) ++
      (if (d <= 0) Nil
      else if (cd <= 0)
        Seq(lit(null).cast(ArrayType(keyType(d - 1))).as("a"))
      else {
        // recurse: nested object → sorted keys then values (Map_Compare's
        // tiers, `map.c:208-246`); nested array → element mini-keys.
        // One budget level reaches TWO semantic levels down: the nested
        // composite's own values still carry rank + numeric magnitude at
        // cd = 0, only their tiebreak degrades to JSON text.
        def kEntry(k: Column): Column = {
          val fs = Seq(lit(11).as("r"), lit(null).cast(DoubleType).as("n"),
            k.as("s"), lit(null).cast(BooleanType).as("b")) ++
            (if (d <= 1) Nil
            else Seq(lit(null).cast(ArrayType(keyType(d - 2))).as("a")))
          struct(fs: _*)
        }
        val m = from_json(txt, MapType(StringType,
          org.apache.spark.sql.types.VariantType))
        val ks = array_sort(map_keys(m))
        val objArr = concat(
          transform(ks, (k: Column) => kEntry(k)),
          transform(ks, k => variantMiniKey(element_at(m, k), d - 1, cd - 1)))
        val elems = from_json(txt,
          ArrayType(org.apache.spark.sql.types.VariantType))
        val arrArr = transform(elems,
          v => variantMiniKey(v, d - 1, cd - 1))
        Seq(when(isObj, objArr).when(isArr, arrArr)
          .otherwise(lit(null).cast(ArrayType(keyType(d - 1)))).as("a"))
      })
    struct(fields: _*)
  }

  /** Order key for a boxed map's (keys, values): Map_Compare's tiers
    * after key count — all keys element-wise (the canonical `m` JSON is
    * key-sorted), then all values semantically — expressed as ONE
    * keys++values array that compares lexicographically.
    */
  private def boxedMapKeyArr(v: Column, d: Int, cd: Int): Column = {
    val m = get_json_object(v.getField("s"), "$.m")
    val entries = from_json(m, MapType(StringType,
      org.apache.spark.sql.types.VariantType))
    def keyEntry(k: Column): Column = {
      val fields = Seq(lit(11).as("r"), lit(null).cast(DoubleType).as("n"),
        k.as("s"), lit(null).cast(BooleanType).as("b")) ++
        (if (d <= 1) Nil
        else Seq(lit(null).cast(ArrayType(keyType(d - 2))).as("a")))
      struct(fields: _*)
    }
    concat(
      transform(map_keys(entries), k => keyEntry(k)),
      transform(map_values(entries), e => variantMiniKey(e, d - 1, cd)))
  }

  /** Recursive order key: list elements map to keys themselves (null
    * element → rank [[NullRank]]), so the lexicographic array comparison
    * Spark applies IS the Cypher list order with nulls greatest.
    */
  private[cypher] def orderKeyAt(v: Column, d: Int, cd: Int = 1): Column = {
    // boxed maps: count orders first (numOf); keys-then-values compare
    // semantically via `a` — the raw boxed JSON must NOT tiebreak in `s`
    // (it would compare values lexicographically before `a` is reached)
    val isBoxedMap = tag(v) === T_BOXED &&
      get_json_object(v.getField("s"), "$.t") === lit(T_BOXED_MAP.toString)
    val sCol =
      if (d <= 0 || cd <= 0) v.getField("s")
      else when(isBoxedMap, lit(null).cast(StringType))
        .otherwise(v.getField("s"))
    val base = Seq(rankOf(v).as("r"), numOf(v).as("n"),
      sCol.as("s"), v.getField("b").as("b"))
    val withArr =
      if (d <= 0) base
      else base :+ (if (cd <= 0)
        // equality budget: the canonical boxed JSON in `s` already decides
        // boxed-map equality; only list elements still recurse
        transform(v.getField("arr"),
          e => orderKeyAt(e, d - 1, cd)).as("a")
      else when(isBoxedMap, boxedMapKeyArr(v, d, cd))
        .otherwise(transform(v.getField("arr"),
          e => orderKeyAt(e, d - 1, cd))).as("a"))
    val nullKey =
      if (d <= 0) Seq(lit(NullRank).as("r"),
        lit(null).cast(DoubleType).as("n"),
        lit(null).cast(StringType).as("s"),
        lit(null).cast(BooleanType).as("b"))
      else Seq(lit(NullRank).as("r"), lit(null).cast(DoubleType).as("n"),
        lit(null).cast(StringType).as("s"),
        lit(null).cast(BooleanType).as("b"),
        lit(null).cast(ArrayType(keyType(d - 1))).as("a"))
    when(v.isNull, struct(nullKey: _*)).otherwise(struct(withArr: _*))
  }

  /** Global-order sort key (`value.h:19-41` enum ranks): sortable struct —
    * (typeRank, numeric, string, bool, element keys). ORDER BY ASC puts a
    * NULL VALUE last (enum T_NULL highest) → pair with
    * asc_nulls_last/desc_nulls_first; null ELEMENTS inside lists rank
    * [[NullRank]] inside the key itself.
    */
  def orderKey(v: Column): Column =
    when(v.isNull, lit(null).cast(keyType(MaxNest)))
      .otherwise(orderKeyAt(v, MaxNest, 1))

  /** EQUALITY key — [[orderKey]] with the boxed-map semantic recursion
    * disabled (`cd = 0`): boxed maps compare by their canonical key-sorted
    * JSON in `s`, which decides EQUALITY exactly (same text ⟺ same map,
    * modulo numeric formatting — the engine's long-standing boxed
    * equality). Join-key extraction and other equality-only consumers use
    * THIS: the semantic recursion exists to ORDER same-count maps and
    * costs real codegen on the hot join path (r15 measured the value-hash
    * join +60% cold with the full ordering key; equality never needed it).
    */
  def eqKey(v: Column): Column =
    when(v.isNull, lit(null).cast(keyType(MaxNest)))
      .otherwise(orderKeyAt(v, MaxNest, 0))

  /** Catalyst type of the full-depth [[orderKey]] struct — for casting
    * empty arrays so both sides of a comparison share one schema.
    */
  private[cypher] val topKeyType: StructType = keyType(MaxNest)

  /** An [[orderKey]]-shaped entry built from raw components (type rank,
    * numeric magnitude, string tiebreak) — for typed map-struct values
    * that are not variants (nested maps, typed arrays/entities), so the
    * map comparison key (Translator.mapOrderKey) stays one fixed type.
    */
  private[cypher] def rawOrderKey(r: Column, n: Column, s: Column): Column =
    struct(r.as("r"), n.as("n"), s.as("s"),
      lit(null).cast(BooleanType).as("b"),
      lit(null).cast(ArrayType(keyType(MaxNest - 1))).as("a"))

  // ── ternary boolean ops ───────────────────────────────────────────────────
  /** Extract SQL boolean (null-preserving); non-bool variants → null. */
  def boolOf(v: Column): Column =
    when(v.isNull, nB).when(tag(v) === T_BOOL, v.getField("b")).otherwise(nB)

  /** Truthiness: only TRUE passes (null/false filtered). The generic
    * rule — comprehension predicates, CASE — matches the reference's
    * SIValue_IsTrue (boolean-only, `value.c:224`).
    */
  def isTrue(v: Column): Column = coalesce(boolOf(v), lit(false))

  /** WHERE-filter truthiness: like [[isTrue]], but a LIST value passes
    * iff non-empty (the reference's FT_N_EXP runtime rule,
    * FilterTree_applyFilters: "An empty array is falsey, all other
    * arrays should return true" — `WHERE [i in xs]` filters on whether
    * the comprehension produced anything). Filter sites only.
    */
  def filterTrue(v: Column): Column =
    when(tag(v) === T_ARRAY, size(v.getField("arr")) > 0)
      .otherwise(coalesce(boolOf(v), lit(false)))

  def and(a: Column, b: Column): Column = vBool(boolOf(a) && boolOf(b))
  def or(a: Column, b: Column): Column = vBool(boolOf(a) || boolOf(b))
  def not(a: Column): Column = vBool(!boolOf(a))
  def xor(a: Column, b: Column): Column = vBool(boolOf(a) =!= boolOf(b))

  // ── arithmetic (int/float promotion, `value.h:51` cross-numeric) ─────────
  private def arith(a: Column, b: Column,
      intOp: (Column, Column) => Column,
      dblOp: (Column, Column) => Column): Column = {
    val bothInt = tag(a) === T_INT && tag(b) === T_INT
    val bothNum = isNum(a) && isNum(b)
    when(a.isNull || b.isNull, vNull)
      .when(bothInt, vInt(intOp(a.getField("i"), b.getField("i"))))
      .when(bothNum, vFloat(dblOp(num(a), num(b))))
      .otherwise(vNull)
  }

  def add(a: Column, b: Column): Column = {
    val anyStr = tag(a) === T_STRING || tag(b) === T_STRING
    val anyArr = tag(a) === T_ARRAY || tag(b) === T_ARRAY
    // `+` with a string on either side stringifies the other operand
    // (value.c SIValue_Add → SIValue_ConcatString; `map.val + '_'` = "5_",
    // test_map.py test03) — list concat wins when a list is also present
    def asStr(v: Column): Column =
      when(tag(v) === T_STRING, v.getField("s")).otherwise(render(v))
    when(a.isNull || b.isNull, vNull)
      .when(anyArr, vArr(concat(
        when(tag(a) === T_ARRAY, a.getField("arr")).otherwise(array(narrow(a))),
        when(tag(b) === T_ARRAY, b.getField("arr")).otherwise(array(narrow(b))))))
      .when(anyStr, vStr(concat(asStr(a), asStr(b))))
      .otherwise(arith(a, b, _ + _, _ + _))
  }
  def sub(a: Column, b: Column): Column = arith(a, b, _ - _, _ - _)
  def mul(a: Column, b: Column): Column = arith(a, b, _ * _, _ * _)
  /** Cypher `/`: int/int is integer division (`numeric_funcs.c:144-203`);
    * float division by zero is IEEE (0.0/0.0 → NaN, x/0.0 → ±Inf — TCK
    * Comparison1 [8]) while integer /0 raises. Guarded so ANSI mode's
    * DIVIDE_BY_ZERO never fires (it would also fire at constant-folding
    * time for literal 0.0/0.0).
    */
  def div(a: Column, b: Column): Column = {
    def intDiv(x: Column, y: Column) =
      when(y === 0, raise_error(lit("/ by zero")).cast(LongType))
        .otherwise((x / nullif(y, lit(0))).cast(LongType))
    def dblDiv(x: Column, y: Column) =
      when(y === 0.0d,
        when(x === 0.0d || isnan(x), lit(Double.NaN))
          .when(x > 0.0d, lit(Double.PositiveInfinity))
          .otherwise(lit(Double.NegativeInfinity)))
        .otherwise(x / nullif(y, lit(0.0d)))
    arith(a, b, intDiv, dblDiv)
  }
  def mod(a: Column, b: Column): Column = arith(a, b, _ % _, _ % _)
  def neg(a: Column): Column =
    when(a.isNull, vNull)
      .when(tag(a) === T_INT, vInt(-a.getField("i")))
      .when(tag(a) === T_FLOAT, vFloat(-a.getField("f")))
      .otherwise(vNull)

  // ── list ops ─────────────────────────────────────────────────────────────
  /** `x IN list` with Cypher null semantics: null if x is null, or if no
    * match but the list contains a null.
    */
  def in(x: Column, list: Column): Column = {
    val arr = list.getField("arr")
    val xs = narrow(x)
    // ternary per candidate: any TRUE → true; else any NULL comparison
    // (null elements, lists containing nulls) → null; else false
    val cmp = transform(arr, e => scalarEq(e, xs))
    when(list.isNotNull && tag(list) === T_ARRAY && size(arr) === 0,
      lit(false)) // anything IN [] is false, even null (TCK Null3 [7])
      .when(x.isNull || list.isNull || tag(list) =!= T_ARRAY, nB)
      .when(exists(cmp, c => coalesce(c, lit(false))), lit(true))
      .when(exists(cmp, c => c.isNull), nB)
      .otherwise(lit(false))
  }

  /** Equality on list-element variants (ternary; nested lists compare
    * pairwise one level down, deeper levels natively).
    */
  def scalarEq(a: Column, b: Column): Column = {
    def sIsNum(v: Column) = v.getField("t") === T_INT || v.getField("t") === T_FLOAT
    def sNum(v: Column) =
      when(v.getField("t") === T_INT, v.getField("i").cast(DoubleType))
        .otherwise(v.getField("f"))
    def sub0Eq(x: Column, y: Column): Column =
      when(x.isNull || y.isNull, nB)
        .when((x.getField("t") === T_INT || x.getField("t") === T_FLOAT) &&
          (y.getField("t") === T_INT || y.getField("t") === T_FLOAT),
          when(x.getField("t") === T_INT, x.getField("i").cast(DoubleType))
            .otherwise(x.getField("f")) ===
            when(y.getField("t") === T_INT, y.getField("i").cast(DoubleType))
              .otherwise(y.getField("f")))
        .when(x.getField("t") =!= y.getField("t"), lit(false))
        .when(x.getField("t") === T_STRING || x.getField("t") === T_BOXED,
          x.getField("s") === y.getField("s"))
        .when(x.getField("t") === T_BOOL, x.getField("b") === y.getField("b"))
        .when(x.getField("t") >= T_DATE && x.getField("t") <= T_DURATION,
          (x.getField("i") <=> y.getField("i")) &&
            (x.getField("f") <=> y.getField("f")) &&
            (x.getField("s") <=> y.getField("s")))
        .otherwise(nB)
    def sub1Eq(x: Column, y: Column): Column =
      when(x.isNull || y.isNull, nB)
        .when((x.getField("t") === T_INT || x.getField("t") === T_FLOAT) &&
          (y.getField("t") === T_INT || y.getField("t") === T_FLOAT),
          when(x.getField("t") === T_INT, x.getField("i").cast(DoubleType))
            .otherwise(x.getField("f")) ===
            when(y.getField("t") === T_INT, y.getField("i").cast(DoubleType))
              .otherwise(y.getField("f")))
        .when(x.getField("t") =!= y.getField("t"), lit(false))
        .when(x.getField("t") === T_STRING || x.getField("t") === T_BOXED,
          x.getField("s") === y.getField("s"))
        .when(x.getField("t") === T_BOOL, x.getField("b") === y.getField("b"))
        .when(x.getField("t") === T_ARRAY,
          listPairEq(x.getField("arr"), y.getField("arr"), sub0Eq))
        .when(x.getField("t") >= T_DATE && x.getField("t") <= T_DURATION,
          (x.getField("i") <=> y.getField("i")) &&
            (x.getField("f") <=> y.getField("f")) &&
            (x.getField("s") <=> y.getField("s")))
        .otherwise(nB)
    when(a.isNull || b.isNull, nB)
      .when(sIsNum(a) && sIsNum(b), sNum(a) === sNum(b))
      .when(a.getField("t") =!= b.getField("t"), lit(false))
      .when(a.getField("t") === T_STRING ||
        a.getField("t") === T_BOXED,
        a.getField("s") === b.getField("s"))
      .when(a.getField("t") === T_BOOL, a.getField("b") === b.getField("b"))
      .when(a.getField("t") === T_ARRAY,
        listPairEq(a.getField("arr"), b.getField("arr"), sub1Eq))
      .when(a.getField("t") >= T_DATE && a.getField("t") <= T_DURATION,
          (a.getField("i") <=> b.getField("i")) &&
            (a.getField("f") <=> b.getField("f")) &&
            (a.getField("s") <=> b.getField("s")))
      .otherwise(nB)
  }

  /** list subscript l[i], negative from end (`list_funcs.c:222-263`). */
  def subscript(l: Column, idx: Column): Column = {
    val arr = l.getField("arr")
    val i = idx.getField("i")
    val n = size(arr)
    val pos = when(i >= 0, i + 1).otherwise(n + i + 1) // element_at is 1-based
    // `get` (0-based, null-on-out-of-range): codegen subexpression
    // elimination may hoist the access out of the bounds guard, so the
    // access itself must never throw (rules out ANSI element_at). NOT
    // try_element_at: its generated code, when extracted into a
    // subexpression function, references the parent method's isNull local
    // ("isNull_N is not an rvalue" Janino error) and the whole projection
    // fell back to interpreted eval (TCK Map1 [1] shape).
    when(l.isNull || idx.isNull || tag(l) =!= T_ARRAY, vNull)
      .when(pos < 1 || pos > n, vNull)
      .otherwise(widen(get(arr, (pos - 1).cast(IntegerType))))
  }

  /** size() of list or string. */
  def sizeOf(v: Column): Column =
    when(v.isNull, vNull)
      .when(tag(v) === T_ARRAY, vInt(size(v.getField("arr"))))
      .when(tag(v) === T_STRING, vInt(length(v.getField("s"))))
      .otherwise(vNull)

  // ── rendering (tests / result serving) ────────────────────────────────────
  /** Canonical temporal rendering (ISO strings, [[TemporalOps.render]]). */
  def temporalRender(v: Column): Column =
    org.apache.spark.sql.GraftColumn.column(TemporalFn("render",
      Seq(org.apache.spark.sql.GraftColumn.expression(v))))

  /** Human/debug string form of a variant. */
  def render(v: Column): Column =
    when(v.isNull, lit("null"))
      .when(tag(v) === T_INT, v.getField("i").cast(StringType))
      .when(tag(v) === T_FLOAT, v.getField("f").cast(StringType))
      .when(tag(v) === T_STRING, v.getField("s"))
      .when(tag(v) === T_BOOL, v.getField("b").cast(StringType))
      .when(tag(v) === T_ARRAY, to_json(v.getField("arr")))
      .when(isTemporal(v), temporalRender(v))
      .otherwise(lit("?"))

  // ── JSON encoding (toJSON ≡ reference `src/util/json_encoder.c`) ─────────
  /** RFC 8259 string escaping: backslash, quote, and control characters. */
  private[cypher] def jsonStr(s: Column): Column = {
    var e = regexp_replace(s, "\\\\", "\\\\\\\\")
    e = regexp_replace(e, "\"", "\\\\\"")
    e = regexp_replace(e, "\n", "\\\\n")
    e = regexp_replace(e, "\r", "\\\\r")
    e = regexp_replace(e, "\t", "\\\\t")
    // remaining control chars (rare) → space; emitting them raw would
    // make the output unparseable
    e = regexp_replace(e, "[\\x00-\\x1f]", " ")
    concat(lit("\""), e, lit("\""))
  }

  /** JSON text of a depth-`d` variant (lists recurse down the nesting). */
  private def jsonAt(e: Column, d: Int): Column = {
    val base = when(e.isNull, lit("null"))
      .when(e.getField("t") === T_INT, e.getField("i").cast(StringType))
      .when(e.getField("t") === T_FLOAT, e.getField("f").cast(StringType))
      .when(e.getField("t") === T_STRING, jsonStr(e.getField("s")))
      .when(e.getField("t") === T_BOOL, e.getField("b").cast(StringType))
    if (d <= 0) base.otherwise(lit("null"))
    else base
      .when(e.getField("t") === T_ARRAY, concat(lit("["),
        concat_ws(", ", transform(e.getField("arr"), x => jsonAt(x, d - 1))),
        lit("]")))
      .otherwise(lit("null"))
  }

  /** JSON text of a variant value (strings quoted+escaped, lists nested). */
  def jsonOf(v: Column): Column = jsonAt(v, MaxNest)

  /** `"properties": {"k": v, …}` for a variant props map (entry order =
    * map construction order, like the reference's property array order).
    */
  def propsJson(props: Column): Column = concat(
    lit("\"properties\": {"),
    concat_ws(", ", transform(map_entries(coalesce(props,
        map().cast(propsType))),
      kv => concat(jsonStr(kv.getField("key")), lit(": "),
        jsonOf(kv.getField("value"))))),
    lit("}"))
}
