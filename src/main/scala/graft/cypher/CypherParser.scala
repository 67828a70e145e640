package graft.cypher

import scala.util.parsing.combinator.RegexParsers

/** Hand-built openCypher parser (subset per the reference's whitelist,
  * `/root/reference/src/ast/cypher_whitelist.c`) on scala-parser-combinators.
  * Produces Ast.Query; the translator rejects what it can't run.
  */
object CypherParser extends RegexParsers {
  import Ast._

  override def skipWhitespace = true
  // line comments (`// …`) and non-nesting block comments (`/* … */`)
  // are whitespace (test_query_validation.py test21)
  override val whiteSpace = """(\s|//[^\n]*|/\*([^*]|\*(?!/))*\*/)+""".r

  // ── lexical ──────────────────────────────────────────────────────────────
  private def kw(s: String): Parser[String] =
    ("""(?i)""" + s + """\b""").r ^^ (_.toUpperCase)

  private val identRe = """[a-zA-Z_][a-zA-Z0-9_]*""".r
  private val reserved = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "AS", "ORDER",
    "BY", "SKIP", "LIMIT", "ASC", "ASCENDING", "DESC", "DESCENDING", "AND",
    "OR", "XOR", "NOT", "IN", "STARTS", "ENDS", "CONTAINS", "IS", "NULL",
    "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "DISTINCT",
    "CREATE", "MERGE", "SET", "DELETE", "DETACH", "UNION", "ALL", "ON",
    "CALL", "YIELD", "REMOVE")

  def ident: Parser[String] =
    identRe.filter(s => !reserved.contains(s.toUpperCase)) |
      "`" ~> """[^`]+""".r <~ "`"

  /** identifiers where keywords are allowed (labels, reltypes, prop keys) */
  def anyIdent: Parser[String] = identRe | "`" ~> """[^`]+""".r <~ "`"

  /** label / relationship-type names: the store encodes a node's labels as
    * ONE ':'-joined ordered string, so a ':' INSIDE a (backtick-quoted)
    * single label would silently alias the two-label encoding — reject
    * loudly at parse time instead.
    */
  def labelIdent: Parser[String] = anyIdent ^^ { l =>
    if (l.contains(":")) throw Ast.ParseRejected(
      s"SyntaxError: ':' is not supported inside a label or relationship " +
        s"type name (`$l` collides with the multi-label encoding)")
    l
  }

  // unrolled-loop patterns: the naive (?:[^'\\]|\\.)* alternation
  // overflows the regex engine's stack on multi-KB literals
  def stringLit: Parser[String] =
    ("'" + """[^'\\]*(?:\\.[^'\\]*)*""" + "'").r ^^
      (s => unescape(s.substring(1, s.length - 1))) |
      ("\"" + """[^"\\]*(?:\\.[^"\\]*)*""" + "\"").r ^^
        (s => unescape(s.substring(1, s.length - 1)))

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          // \uXXXX (4 hex) / \UXXXXXXXX (8 hex) unicode escapes
          // (openCypher Literals6); bad digits are a compile-time error
          case u @ ('u' | 'U') =>
            val width = if (u == 'u') 4 else 8
            val hex = s.substring(i + 2,
              math.min(s.length, i + 2 + width))
            val cp = try {
              require(hex.length == width)
              Integer.parseInt(hex, 16)
            } catch { case _: Exception => throw Ast.ParseRejected(
              s"InvalidUnicodeLiteral: \\$u$hex") }
            sb.appendAll(Character.toChars(cp))
            i += 2 + width
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def floatLit: Parser[Double] =
    """-?(\d+\.\d+([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+)""".r >>
      { s =>
        val d = s.toDouble
        // a finite literal overflowing double range is a compile-time
        // error (TCK Literals5 [27] FloatingPointOverflow)
        if (d.isInfinite)
          err(s"FloatingPointOverflow: $s does not fit in a float")
        else success(d)
      }
  def intLit: Parser[Long] = """-?\d+""".r ^^ (_.toLong)

  /** Overflow-checked signed parse at any radix (IntegerOverflow is a
    * compile-time error; -2^63 is in range only with its sign attached).
    */
  private def checkedRadix(src: String, skip: Int, radix: Int): Long = {
    val neg = src.startsWith("-")
    val digits = (if (neg) src.tail else src).drop(skip)
    val b = BigInt(digits, radix)
    val v = if (neg) -b else b
    if (!v.isValidLong)
      throw Ast.ParseRejected(s"IntegerOverflow: integer literal $src")
    v.toLong
  }

  /** Full numeric literal ladder: hex (0x), explicit octal (0o), floats,
    * legacy leading-zero octal, decimal — signs included so -2^63 and
    * negative radix literals parse as single tokens (openCypher
    * Literals2-5).
    */
  def numberLit: Parser[Expr] =
    """-?0[xX][0-9a-fA-F]+""".r ^^ (s => LitInt(checkedRadix(s, 2, 16))) |
      """-?0o[0-7]+""".r ^^ (s => LitInt(checkedRadix(s, 2, 8))) |
      floatLit ^^ (LitFloat(_)) |
      """-?0[0-7]+(?![0-9a-zA-Z_.])""".r ^^ (s => LitInt(checkedRadix(s, 1, 8))) |
      """-?\d+""".r ^^ (s => LitInt(checkedRadix(s, 0, 10)))

  // ── expressions (precedence ladder) ──────────────────────────────────────
  def expr: Parser[Expr] = orExpr

  def orExpr: Parser[Expr] =
    xorExpr ~ rep(kw("OR") ~> xorExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => Bin("OR", a, b))
    }
  def xorExpr: Parser[Expr] =
    andExpr ~ rep(kw("XOR") ~> andExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => Bin("XOR", a, b))
    }
  def andExpr: Parser[Expr] =
    notExpr ~ rep(kw("AND") ~> notExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => Bin("AND", a, b))
    }
  def notExpr: Parser[Expr] =
    kw("NOT") ~> notExpr ^^ (Not(_)) | comparison

  def comparison: Parser[Expr] =
    addSub ~ rep(compOp) ^^ { case h ~ t =>
      // chained comparisons a < b < c → (a<b) AND (b<c)
      if (t.isEmpty) h
      else {
        val pairs = (h +: t.map(_._2)).sliding(2).toList
          .zip(t.map(_._1))
          .map { case (Seq(l, r), op) => Bin(op, l, r): Expr }
        pairs.reduceLeft((a, b) => Bin("AND", a, b))
      }
    }

  private def compOp: Parser[(String, Expr)] =
    ("<>" | "<=" | ">=" | "=" | "<" | ">") ~ addSub ^^ { case op ~ e => (op, e) } |
      kw("IN") ~> addSub ^^ (e => ("IN", e)) |
      kw("STARTS") ~> kw("WITH") ~> addSub ^^ (e => ("STARTSWITH", e)) |
      kw("ENDS") ~> kw("WITH") ~> addSub ^^ (e => ("ENDSWITH", e)) |
      kw("CONTAINS") ~> addSub ^^ (e => ("CONTAINS", e))

  def addSub: Parser[Expr] =
    mulDiv ~ rep(("+" | "-") ~ mulDiv) ^^ { case h ~ t =>
      t.foldLeft(h) { case (a, op ~ b) => Bin(op, a, b) }
    }
  def mulDiv: Parser[Expr] =
    powExpr ~ rep(("*" | "/" | "%") ~ powExpr) ^^ { case h ~ t =>
      t.foldLeft(h) { case (a, op ~ b) => Bin(op, a, b) }
    }
  def powExpr: Parser[Expr] =
    unary ~ rep("^" ~> unary) ^^ { case h ~ t =>
      // right-associative
      val all = h +: t
      all.reduceRight((a, b) => Bin("^", a, b))
    }
  def unary: Parser[Expr] =
    guard("""-?[0-9.]""".r) ~> numberLit ~ rep(postfixOp) ^^ { case a ~ ops =>
      ops.foldLeft(a: Expr)((e, f) => f(e))
    } |
      "-" ~> unary ^^ (Neg(_)) | "+" ~> unary | postfix

  /** postfix: property access, IS NULL, subscript/slice. */
  def postfix: Parser[Expr] =
    atom ~ rep(postfixOp) ^^ { case a ~ ops => ops.foldLeft(a)((e, f) => f(e)) }

  private def postfixOp: Parser[Expr => Expr] =
    "." ~> anyIdent ^^ (k => (e: Expr) => Prop(e, k)) |
      // label predicate in expression context (`n:Person`); chained
      // labels conjoin. NOT inside patterns — those parse via nodePat.
      ":" ~> labelIdent ^^ (l => (e: Expr) => HasLabel(e, l)) |
      kw("IS") ~> kw("NOT") ~> kw("NULL") ^^^ ((e: Expr) => IsNull(e, negated = true)) |
      kw("IS") ~> kw("NULL") ^^^ ((e: Expr) => IsNull(e, negated = false)) |
      ("[" ~> expr ~ opt(".." ~> opt(expr)) <~ "]") ^^ {
        case i ~ None => (e: Expr) => Subscript(e, i)
        case from ~ Some(to) => (e: Expr) => SliceExpr(e, Some(from), to)
      } |
      ("[" ~> ".." ~> opt(expr) <~ "]") ^^ (to => (e: Expr) => SliceExpr(e, None, to)) |
      mapProjOp

  /** Map projection (`a {.val, other, k: expr, .*}`,
    * test_map.py test02): desugars onto the existing map-literal AST —
    * `.key` reads the key off the target, a bare variable injects itself
    * under its own name, `k: expr` passes through, and a LONE `.*` is
    * properties(target). The target must be a variable (the reference
    * errors on `5 {v: 'b'}` with "Encountered unhandled type").
    */
  private def mapProjItem: Parser[(String, Option[Expr])] =
    "." ~ "*" ^^^ (("*", None)) |
      "." ~> anyIdent ^^ (k => (k, None)) |
      anyIdent ~ (":" ~> expr) ^^ { case k ~ v => (k, Some(v)) } |
      anyIdent ^^ (k => (k, Some(Variable(k))))

  private def mapProjOp: Parser[Expr => Expr] =
    "{" ~> repsep(mapProjItem, ",") <~ "}" ^^ { items => (target: Expr) =>
      target match {
        case v: Variable =>
          if (items.exists(_._1 == "*")) {
            if (items.size != 1) throw Translator.TranslateError(
              "map projection: .* cannot be combined with other items")
            Fn("properties", List(v))
          } else MapLit(items.map {
            case (k, None) => (k, Prop(v, k))
            case (k, Some(e)) => (k, e)
          })
        case other => throw Translator.TranslateError(
          s"Encountered unhandled type: map projection requires a " +
            s"variable target, got $other")
      }
    }

  def atom: Parser[Expr] =
    caseExpr |
      quantifier |
      patternComprehension |
      listComprehension |
      kw("COUNT") ~ "(" ~ "*" ~ ")" ^^^ CountStar |
      functionCall |
      patternPredicate |
      kw("TRUE") ^^^ LitBool(true) |
      kw("FALSE") ^^^ LitBool(false) |
      kw("NULL") ^^^ LitNull |
      numberLit |
      stringLit ^^ (LitString(_)) |
      // parameter names may be plain identifiers OR bare integers ($1)
      "$" ~> (anyIdent | """\d+""".r) ^^ (Param(_)) |
      mapLit |
      listLit |
      "(" ~> expr <~ ")" |
      ident ^^ (Variable(_))

  def caseExpr: Parser[Expr] =
    kw("CASE") ~> opt(not(kw("WHEN")) ~> expr) ~
      rep1(kw("WHEN") ~> expr ~ (kw("THEN") ~> expr)) ~
      opt(kw("ELSE") ~> expr) <~ kw("END") ^^ {
      case scrut ~ whens ~ els =>
        CaseExpr(scrut, whens.map { case w ~ t => (w, t) }, els)
    }

  def quantifier: Parser[Expr] =
    (kw("ANY") | kw("ALL") | kw("NONE") | kw("SINGLE")) ~
      ("(" ~> ident) ~ (kw("IN") ~> expr) ~
      opt(kw("WHERE") ~> expr) <~ ")" ^^ {
      case k ~ v ~ l ~ Some(p) => Quantifier(k.toLowerCase, v, l, p)
      case k ~ _ ~ _ ~ None =>
        // the reference rejects a predicate-less quantifier
        // (`arithmetic_expression_construct.c:601`)
        throw Ast.ParseRejected(
          s"'${k.toLowerCase}' function requires a WHERE predicate")
    }

  /** [ (a)-[r]->(b) WHERE pred | proj ] — requires ≥1 relationship so a
    * bracketed parenthesized expression stays a list literal.
    */
  def patternComprehension: Parser[Expr] =
    "[" ~> pathPattern.filter(_.tail.nonEmpty) ~ opt(kw("WHERE") ~> expr) ~
      ("|" ~> expr) <~ "]" ^^ {
      case p ~ w ~ proj => PatternComprehension(p, w, proj)
    }

  def listComprehension: Parser[Expr] =
    "[" ~> ident ~ (kw("IN") ~> expr) ~ opt(kw("WHERE") ~> expr) ~
      opt("|" ~> expr) <~ "]" ^^ {
      case v ~ l ~ w ~ p => ListComprehension(v, l, w, p)
    }

  /** namespaced function suffixes (`datetime.truncate`, `duration.between`,
    * clock selectors) — whitelisted so `var.prop` never lexes as a
    * function name.
    */
  private val fnSuffixes = Set("truncate", "between", "inmonths", "indays",
    "inseconds", "statement", "transaction", "realtime", "fromepoch",
    "fromepochmillis")

  def functionCall: Parser[Expr] =
    (anyIdent ~ opt("." ~> anyIdent) ~
      ("(" ~> opt(kw("DISTINCT")) ~ repsep(expr, ",") <~ ")")).filter {
      case name ~ suffix ~ _ =>
        (!reserved.contains(name.toUpperCase) ||
          name.toUpperCase == "EXISTS") &&
          suffix.forall(s => fnSuffixes.contains(s.toLowerCase))
    } ^^ { case name ~ suffix ~ (d ~ args) =>
      Fn((name +: suffix.toList).mkString(".").toLowerCase, args, d.isDefined)
    }

  def patternPredicate: Parser[Expr] =
    pathPattern.filter(_.tail.nonEmpty) ^^ (PatternPred(_))

  def mapLit: Parser[Expr] =
    "{" ~> repsep(anyIdent ~ (":" ~> expr), ",") <~ "}" ^^ (entries =>
      MapLit(entries.map { case k ~ v => (k, v) }))

  def listLit: Parser[Expr] =
    "[" ~> repsep(expr, ",") <~ "]" ^^ (ListLit(_))

  // ── patterns ─────────────────────────────────────────────────────────────
  def propMap: Parser[List[(String, Expr)]] =
    "{" ~> repsep(anyIdent ~ (":" ~> expr), ",") <~ "}" ^^
      (_.map { case k ~ v => (k, v) })

  def nodePat: Parser[NodePat] =
    // multiple labels `(n:A:B)` conjoin; the NodePat keeps them as ONE
    // ':'-joined ordered string (the node store's label encoding), deduped
    // preserving written order (`MATCH (n:A:B:A)` ≡ `(n:A:B)`)
    "(" ~> opt(ident) ~ rep(":" ~> labelIdent) ~ opt(propMap) <~ ")" ^^ {
      case v ~ ls ~ p => NodePat(v,
        if (ls.isEmpty) None else Some(ls.distinct.mkString(":")),
        p.getOrElse(Nil), bracesGiven = p.isDefined)
    }

  private def varLenSpec: Parser[(Int, Option[Int])] =
    "*" ~> (
      (intLit ~ (".." ~> opt(intLit))) ^^ {          // *1..3 / *1..
        case mn ~ mx => (mn.toInt, mx.map(_.toInt))
      } |
        (".." ~> intLit) ^^ (mx => (1, Some(mx.toInt))) | // *..3
        ".." ^^^ ((1, None: Option[Int])) |               // *.. (unbounded)
        intLit ^^ (n => (n.toInt, Some(n.toInt))) |       // *2 (exactly)
        success((1, None))) >> { case (mn, mx) =>         // bare *
      if (mn < 0 || mx.exists(_ < 0))
        err(s"InvalidRelationshipPattern: negative variable-length bound")
      else success((mn, mx))
    }

  private def relDetail: Parser[RelPat] =
    "[" ~> opt(ident) ~
      opt(":" ~> rep1sep(labelIdent, "|" ~ opt(":"))) ~
      opt(varLenSpec) ~ opt(propMap) <~ "]" ^^ {
      case v ~ t ~ vl ~ p =>
        RelPat(v, t.getOrElse(Nil), p.getOrElse(Nil), 0, vl)
    }

  def relPat: Parser[RelPat] =
    // <-[..]-> / <--> : both arrowheads ≡ undirected (openCypher grammar)
    ("<-" ~> relDetail <~ "->") ^^ (_.copy(direction = 0)) |
      ("<-" ~> relDetail <~ "-" ~ not(">")) ^^ (_.copy(direction = -1)) |
      ("-" ~> relDetail <~ "->") ^^ (_.copy(direction = 1)) |
      ("-" ~> relDetail <~ "-" ~ not(">")) ^^ (_.copy(direction = 0)) |
      // `^^ { _ => ... }`, NOT `^^^`: ^^^ caches its value in a lazy val,
      // which would make every bare arrow in every query share ONE RelPat
      // instance — the translator names anonymous patterns by object
      // identity, so shared instances collide into duplicate join columns
      "<-" ~ "->" ^^ { _ => RelPat(None, Nil, Nil, 0, None) } |
      "<-" ~ "-" ~ not(">") ^^ { _ => RelPat(None, Nil, Nil, -1, None) } |
      "-" ~ "->" ^^ { _ => RelPat(None, Nil, Nil, 1, None) } |
      "--" ~ not(">") ^^ { _ => RelPat(None, Nil, Nil, 0, None) }

  private def barePath: Parser[PathPat] =
    nodePat ~ rep(relPat ~ nodePat) ^^ {
      case h ~ t => PathPat(None, h, t.map { case r ~ n => (r, n) })
    }

  def pathPattern: Parser[PathPat] =
    opt(ident <~ "=") ~ (
      ("""(?i)allshortestpaths""".r ~ "(") ~> barePath <~ ")" ^^
        (_.copy(shortest = true, allShortest = true)) |
      ("""(?i)shortestpath""".r ~ "(") ~> barePath <~ ")" ^^
        (_.copy(shortest = true)) |
        barePath) ^^ {
      case pv ~ p => p.copy(pathVar = pv)
    }

  def patternList: Parser[List[PathPat]] = rep1sep(pathPattern, ",")

  // ── clauses ──────────────────────────────────────────────────────────────
  def matchClause: Parser[Clause] =
    opt(kw("OPTIONAL")) ~ (kw("MATCH") ~> patternList) ~
      opt(kw("WHERE") ~> expr) ^^ {
      case o ~ ps ~ w => Match(o.isDefined, ps, w)
    }

  def unwindClause: Parser[Clause] =
    kw("UNWIND") ~> expr ~ (kw("AS") ~> ident) ^^ {
      case e ~ a => Unwind(e, a)
    }

  def sortItem: Parser[SortItem] =
    expr ~ opt(kw("ASCENDING") | kw("ASC") | kw("DESCENDING") | kw("DESC")) ^^ {
      case e ~ d => SortItem(e, !d.exists(_.startsWith("DESC")))
    }

  def projectionBody: Parser[Projection] = projectionBody(false)

  def projectionBody(requireAlias: Boolean): Parser[Projection] =
    opt(kw("DISTINCT")) ~
      rep1sep(returnItem(requireAlias), ",") ~
      opt(kw("ORDER") ~> kw("BY") ~> rep1sep(sortItem, ",")) ~
      opt(kw("SKIP") ~> expr) ~ opt(kw("LIMIT") ~> expr) ^^ {
      case d ~ items ~ ob ~ sk ~ lm =>
        Projection(d.isDefined, items, ob.getOrElse(Nil), sk, lm)
    }

  /** Run `p` and also capture the exact source text it consumed —
    * unaliased projection items are named by their literal query text
    * (openCypher result-column naming, e.g. `count(r)`, `n.v IS NULL`).
    */
  private def sourceOf[T](p: Parser[T]): Parser[(T, String)] = Parser { in =>
    p(in) match {
      case Success(t, rest) =>
        Success((t,
          in.source.subSequence(in.offset, rest.offset).toString.trim), rest)
      case ns: NoSuccess => ns
    }
  }

  def returnItem(requireAlias: Boolean): Parser[(Expr, Option[String])] =
    "*" ^^^ (Variable("*"), None) |
      sourceOf(expr) ~ opt(kw("AS") ~> ident) >> {
        case (e, raw) ~ a =>
          if (requireAlias && a.isEmpty && !e.isInstanceOf[Variable])
            // WITH requires aliases on non-variable items
            // (openCypher NoExpressionAlias, compile-time)
            err(s"Expression in WITH must be aliased (use AS): $raw")
          else
            success((e, a.orElse(e match {
              // bare variables keep their name (no synthetic alias so the
              // translator's entity carry/scoping logic sees the variable)
              case Variable(_) => None
              case _ => Some(raw)
            })))
      }

  def withClause: Parser[Clause] =
    kw("WITH") ~> projectionBody(true) ~ opt(kw("WHERE") ~> expr) ^^ {
      case p ~ w => With(p, w)
    }

  def returnClause: Parser[Clause] =
    kw("RETURN") ~> projectionBody ^^ (Return(_))

  def createClause: Parser[Clause] =
    kw("CREATE") ~> patternList ^^ (Create(_))

  /** One SET item; `n += {map}` desugars to per-key items (merge
    * semantics: only listed keys overwritten — reference
    * `tests/flow/test_entity_update.py:67`); `n = {map}` stays whole
    * (replacement semantics, handled by the mutation runner).
    */
  def setItem: Parser[List[SetItem]] =
    // SET n:Label (single-label model: one write per item; the
    // translator rejects stacked labels on an already-labeled node)
    ident ~ rep1(":" ~> labelIdent) ^^ { case v ~ labels =>
      labels.map(l => SetItem(Variable(v), Some(LabelKey), LitString(l)))
    } |
      postfix ~ ("+=" ~> expr) ^^ {
      case t ~ MapLit(entries) =>
        entries.map { case (k, v) => SetItem(t, Some(k), v) }
      case t ~ (p: Param) =>
        // `SET n += $props`: desugars per-key at execution time, when the
        // parameter map is known (internal marker function)
        List(SetItem(t, None, Fn("__merge_param", List(p), false)))
      case t ~ other =>
        // `SET n += <map expr>` (projected alias / entity): merged at
        // execution via the runner's map fold (internal marker function)
        List(SetItem(t, None, Fn("__merge_value", List(other), false)))
    } |
      postfix ~ ("=" ~> expr) ^^ {
        case Prop(t, k) ~ v => List(SetItem(t, Some(k), v))
        case t ~ v => List(SetItem(t, None, v))
      }

  def setClause: Parser[Clause] =
    kw("SET") ~> rep1sep(setItem, ",") ^^ (xs => SetClause(xs.flatten))

  /** REMOVE n.prop / REMOVE n:Label — desugars to null-valued SET items
    * (Cypher stores no null property; label null = unlabeled).
    */
  def removeClause: Parser[Clause] =
    kw("REMOVE") ~> rep1sep(
      ident ~ rep1(":" ~> labelIdent) ^^ { case v ~ labels =>
        // conditional: the label comes off only if it matches
        labels.map(l => SetItem(Variable(v), Some(LabelKey),
          Fn("__remove_label", List(LitString(l)))))
      } |
        postfix ^? ({
          case Prop(t, k) => List(SetItem(t, Some(k), LitNull))
        }, e => s"REMOVE expects a property or label: $e"),
      ",") ^^ (xs => SetClause(xs.flatten))

  def deleteClause: Parser[Clause] =
    opt(kw("DETACH")) ~ (kw("DELETE") ~> rep1sep(expr, ",")) ^^ {
      case d ~ es => Delete(es, d.isDefined)
    }

  def mergeClause: Parser[Clause] =
    kw("MERGE") ~> pathPattern ~
      rep(kw("ON") ~ (kw("MATCH") | kw("CREATE")) ~ (kw("SET") ~> rep1sep(setItem, ","))) ^^ {
      case p ~ actions =>
        val onMatch = actions.collect {
          case _ ~ "MATCH" ~ items => items.flatten
        }.flatten
        val onCreate = actions.collect {
          case _ ~ "CREATE" ~ items => items.flatten
        }.flatten
        Merge(p, onMatch, onCreate)
    }

  def callClause: Parser[Clause] =
    kw("CALL") ~> rep1sep(anyIdent, ".") ~
      opt("(" ~> repsep(expr, ",") <~ ")") ~
      opt(kw("YIELD") ~> rep1sep(anyIdent ~ opt(kw("AS") ~> ident), ",") ~
        // `YIELD … WHERE pred` filters the yielded rows in place
        // (test_procedures.py test04 mixes CALL+WHERE without a WITH)
        opt(kw("WHERE") ~> expr)) ^^ {
      case parts ~ args ~ y =>
        CallProc(parts.mkString("."), args.getOrElse(Nil),
          y.map(_._1).getOrElse(Nil).map { case c ~ a => (c, a) },
          explicitArgs = args.isDefined,
          where = y.flatMap(_._2))
    }

  /** CREATE INDEX ON :Label(p1[, p2, …]) / DROP INDEX ON :Label(prop)
    * (reference commands.md "Indexing"; each property is its own
    * single-property node index — `test_index_create.py` test02 counts
    * per-property creations, duplicates included in one statement).
    */
  def indexClause: Parser[Clause] =
    kw("CREATE") ~> kw("INDEX") ~> kw("ON") ~> ":" ~> labelIdent ~
      ("(" ~> rep1sep(anyIdent, ",") <~ ")") ^^ {
      case label ~ props => CreateIndex(label, props)
    } |
    kw("DROP") ~> kw("INDEX") ~> kw("ON") ~> ":" ~> labelIdent ~
      ("(" ~> anyIdent <~ ")") ^^ {
      case label ~ prop => DropIndex(label, prop)
    }

  def clause: Parser[Clause] =
    indexClause | matchClause | unwindClause | withClause | returnClause |
      createClause | mergeClause | setClause | removeClause | deleteClause |
      callClause

  def singleQuery: Parser[SingleQuery] = rep1(clause) ^^ (SingleQuery(_))

  def query: Parser[Query] =
    singleQuery ~ rep((kw("UNION") ~> opt(kw("ALL"))) ~ singleQuery) ^^ {
      case h ~ t =>
        Query(h :: t.map { case _ ~ q => q },
          t.map { case a ~ _ => a.isDefined })
    }

  /** `CYPHER name=value …` query prefix: the reference's wire-level
    * parameter syntax (commands.md "Query parameters" — clients prepend
    * `CYPHER k=v` pairs, optionally `;`-separated from the query body).
    */
  private def paramValue: Parser[Any] =
    floatLit ^^ (x => x: Any) |
      intLit ^^ (x => x: Any) |
      stringLit ^^ (x => x: Any) |
      kw("TRUE") ^^^ (true: Any) |
      kw("FALSE") ^^^ (false: Any) |
      kw("NULL") ^^^ (null: Any) |
      "[" ~> repsep(paramValue, ",") <~ "]" ^^ (xs => xs: Any) |
      // map values (reference test_entity_update.py:110 —
      // `CYPHER props={v1: true} … SET n += $props`)
      "{" ~> repsep(anyIdent ~ (":" ~> paramValue), ",") <~ "}" ^^ {
        pairs => pairs.map { case k ~ v => k -> v }.toMap: Any
      }

  private def cypherPrefix: Parser[Map[String, Any]] =
    kw("CYPHER") ~> rep1(anyIdent ~ ("=" ~> paramValue)) <~ opt(";") ^^ {
      pairs => pairs.map { case k ~ v => k -> v }.toMap
    }

  /** Split a leading `CYPHER k=v …` prefix off `input`: (params, body).
    * Inputs without the prefix pass through with empty params.
    */
  def splitParams(input: String): (Map[String, Any], String) = {
    // fast path: no `CYPHER` keyword prefix (the overwhelmingly common
    // case) — skip the parser attempt entirely (it would fail after real
    // work, taxing every point read on the serving path). Any whitespace
    // may follow the keyword (the parser's whiteSpace), not just ' '.
    val t = input.dropWhile(_.isWhitespace)
    if (t.length < 7 || !t.substring(0, 6).equalsIgnoreCase("CYPHER") ||
        !t.charAt(6).isWhitespace)
      return (Map.empty, input)
    parse(cypherPrefix, input) match {
      case Success(m, next) => (m, input.substring(next.offset))
      case _ => (Map.empty, input)
    }
  }

  /** Parse a full query; Left(error) on failure. */
  def parse(input: String): Either[String, Query] =
    parseAll(query, input) match {
      case Success(q, _) => Right(q)
      case NoSuccess(msg, next) =>
        Left(s"Cypher parse error at ${next.pos.line}:${next.pos.column}: $msg")
      case other => Left(other.toString)
    }
}
