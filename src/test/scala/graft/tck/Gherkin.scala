package graft.tck

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Minimal Gherkin reader for the openCypher TCK corpus the reference runs
  * (`/root/reference/tests/tck/test_tck.py:13-23` over
  * `tests/tck/features/`). Supports exactly the constructs that corpus
  * uses: Feature/Scenario/Scenario Outline + Examples, tags, data tables,
  * doc strings, and `<param>` substitution.
  */
object Gherkin {

  final case class Step(keyword: String, text: String,
      doc: Option[String], table: Option[List[List[String]]])

  final case class Scenario(feature: String, name: String,
      tags: Set[String], steps: List[Step], file: String, line: Int) {
    def id: String = s"$feature :: $name"
  }

  def parseFile(path: Path): List[Scenario] = {
    val lines = Files.readAllLines(path).asScala.toVector
    var i = 0
    var feature = ""
    var fileTags = Set.empty[String]
    var pendingTags = Set.empty[String]
    var background: List[Step] = Nil
    val out = scala.collection.mutable.ListBuffer[Scenario]()

    def peek: String = if (i < lines.length) lines(i).trim else ""

    def readDoc(): Option[String] =
      if (peek == "\"\"\"") {
        i += 1
        val buf = scala.collection.mutable.ListBuffer[String]()
        // doc strings keep raw lines (queries are whitespace-sensitive
        // only for readability; trim common indent)
        while (i < lines.length && lines(i).trim != "\"\"\"") {
          buf += lines(i); i += 1
        }
        i += 1 // closing quotes
        val nonEmpty = buf.filter(_.trim.nonEmpty)
        val indent =
          if (nonEmpty.isEmpty) 0
          else nonEmpty.map(l => l.indexWhere(!_.isWhitespace)).min
        Some(buf.map(l => if (l.length >= indent) l.drop(indent) else l)
          .mkString("\n"))
      } else None

    def readTable(): Option[List[List[String]]] = {
      val rows = scala.collection.mutable.ListBuffer[List[String]]()
      while (peek.startsWith("|")) {
        val cells = splitRow(peek)
        rows += cells
        i += 1
      }
      if (rows.isEmpty) None else Some(rows.toList)
    }

    def readSteps(): List[Step] = {
      val steps = scala.collection.mutable.ListBuffer[Step]()
      var done = false
      while (!done && i < lines.length) {
        val t = peek
        val kw = List("Given ", "When ", "Then ", "And ", "But ")
          .find(t.startsWith)
        if (kw.isDefined) {
          i += 1
          val doc = readDoc()
          val table = readTable()
          steps += Step(kw.get.trim, t.drop(kw.get.length).trim, doc, table)
        } else if (t.isEmpty || t.startsWith("#")) i += 1
        else done = true
      }
      steps.toList
    }

    while (i < lines.length) {
      val t = peek
      if (t.startsWith("@")) {
        pendingTags ++= t.split("\\s+").filter(_.startsWith("@")).map(_.tail)
        i += 1
      } else if (t.startsWith("Feature:")) {
        feature = t.drop("Feature:".length).trim
        fileTags = pendingTags; pendingTags = Set.empty
        i += 1
      } else if (t.startsWith("Background:")) {
        i += 1
        background = readSteps()
      } else if (t.startsWith("Scenario Outline:") || t.startsWith("Scenario:")) {
        val isOutline = t.startsWith("Scenario Outline:")
        val name = t.dropWhile(_ != ':').tail.trim
        val line = i + 1
        val tags = fileTags ++ pendingTags; pendingTags = Set.empty
        i += 1
        val steps = readSteps()
        if (isOutline) {
          // Examples: block follows the steps
          while (i < lines.length && peek.isEmpty) i += 1
          if (peek.startsWith("Examples:")) {
            i += 1
            while (i < lines.length && (peek.isEmpty || peek.startsWith("#")))
              i += 1
            readTable() match {
              case Some(header :: rows) =>
                rows.zipWithIndex.foreach { case (row, k) =>
                  val subst = header.zip(row).toMap
                  def sub(s: String): String =
                    subst.foldLeft(s) { case (acc, (h, v)) =>
                      acc.replace(s"<$h>", v)
                    }
                  out += Scenario(feature, s"$name #${k + 1}", tags,
                    background ++ steps.map(st => st.copy(text = sub(st.text),
                      doc = st.doc.map(sub),
                      table = st.table.map(_.map(_.map(sub))))),
                    path.toString, line)
                }
              case _ => ()
            }
          }
        } else {
          out += Scenario(feature, name, tags, background ++ steps,
            path.toString, line)
        }
      } else i += 1
    }
    out.toList
  }

  /** `| a | b |` → List(a, b); escaped pipes `\|` kept literal. */
  private[tck] def splitRow(row: String): List[String] = {
    val inner = row.trim.stripPrefix("|").stripSuffix("|")
    val cells = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var esc = false
    inner.foreach { ch =>
      if (esc) {
        // Gherkin cell escapes are \| \\ \n ONLY — any other backslash
        // pair (e.g. the \' inside a TCK string literal) stays verbatim
        // for the value parser
        ch match {
          case '|' => cur += '|'
          case '\\' => cur += '\\'
          case 'n' => cur += '\n'
          case other => cur += '\\'; cur += other
        }
        esc = false
      }
      else if (ch == '\\') esc = true
      else if (ch == '|') { cells += cur.result().trim; cur.clear() }
      else cur += ch
    }
    cells += cur.result().trim
    cells.toList
  }

  def parseTree(root: Path): List[Scenario] = {
    val files = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".feature")).toList.sortBy(_.toString)
    files.flatMap(parseFile)
  }
}
