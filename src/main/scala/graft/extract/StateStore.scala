package graft.extract

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Instant

/** Extract-state persistence: the reference keeps per-table extract
  * history (rows/min/max/partitions/predicates/dates) in a TinyDB
  * JSON file with introspection expiry (extract.py `Extract` /
  * `ExtractDB`, pipeline.py introspection_expire_s). Same model
  * here: a single JSON file of ExtractState records, atomically
  * replaced on save. Driver-side metadata only — never on the data
  * path, so cluster scale is untouched.
  */
final case class ExtractState(
    name: String,
    rows: Option[Long] = None,
    minKey: Option[Long] = None,
    maxKey: Option[Long] = None,
    partitionColumn: Option[String] = None,
    partitions: Option[Int] = None,
    predicates: Seq[String] = Nil,
    introspectEpochS: Option[Long] = None,
    extractUri: Option[String] = None,
    extractBytes: Option[Long] = None,
    rowsLoaded: Option[Long] = None) {

  /** reference extract.py:36 `consistent`. */
  def consistent: Boolean = rows.isDefined && rows == rowsLoaded

  /** reference pipeline.py:286-300: expired ⇒ re-introspect. */
  def introspectionExpired(expireS: Long, nowEpochS: Long = Instant.now.getEpochSecond): Boolean =
    introspectEpochS match {
      case None => true
      case Some(t) => expireS > 0 && nowEpochS - t > expireS
    }
}

class StateStore(path: String) {
  private var states: Map[String, ExtractState] = load()

  def get(name: String): ExtractState =
    states.getOrElse(name, ExtractState(name))

  def put(s: ExtractState): Unit = synchronized {
    states = states.updated(s.name, s)
    persist()
  }

  def all: Seq[ExtractState] = states.values.toSeq.sortBy(_.name)

  // -- hand-rolled JSON (no deps beyond the JDK) ----------------------

  private def esc(s: String) =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  private def field[T](k: String, v: Option[T]): Seq[String] =
    v.toSeq.map {
      case s: String => s""""$k": "${esc(s)}""""
      case x => s""""$k": $x"""
    }

  private def persist(): Unit = {
    val docs = all.map { s =>
      (Seq(s""""name": "${esc(s.name)}"""") ++
        field("rows", s.rows) ++ field("minKey", s.minKey) ++
        field("maxKey", s.maxKey) ++
        field("partitionColumn", s.partitionColumn) ++
        field("partitions", s.partitions) ++
        Seq(s""""predicates": [${s.predicates.map(p => s""""${esc(p)}"""").mkString(", ")}]""") ++
        field("introspectEpochS", s.introspectEpochS) ++
        field("extractUri", s.extractUri) ++
        field("extractBytes", s.extractBytes) ++
        field("rowsLoaded", s.rowsLoaded))
        .mkString("  {", ", ", "}")
    }
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, docs.mkString("[\n", ",\n", "\n]\n"))
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def load(): Map[String, ExtractState] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    // Minimal parser for the exact shape persist() writes.
    val text = Files.readString(p)
    val doc = """\{([^{}]*)\}""".r
    doc.findAllMatchIn(text).map(_.group(1)).map(parseDoc).map(s => s.name -> s).toMap
  }

  private def parseDoc(body: String): ExtractState = {
    val str = """"(\w+)":\s*"((?:[^"\\]|\\.)*)"""".r
    val num = """"(\w+)":\s*(\d+)""".r
    val arr = """"predicates":\s*\[(.*?)\]""".r
    val strs = str.findAllMatchIn(body).map(m => m.group(1) -> unesc(m.group(2))).toMap
    val nums = num.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toLong).toMap
    val preds = arr.findFirstMatchIn(body).map(_.group(1)).filter(_.nonEmpty)
      .map(inner => """"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(inner).map(m => unesc(m.group(1))).toSeq)
      .getOrElse(Nil)
    ExtractState(
      name = strs("name"),
      rows = nums.get("rows"), minKey = nums.get("minKey"), maxKey = nums.get("maxKey"),
      partitionColumn = strs.get("partitionColumn"),
      partitions = nums.get("partitions").map(_.toInt),
      predicates = preds,
      introspectEpochS = nums.get("introspectEpochS"),
      extractUri = strs.get("extractUri"), extractBytes = nums.get("extractBytes"),
      rowsLoaded = nums.get("rowsLoaded"))
  }

  /** Single left-to-right pass (sequential replace() calls corrupt
    * inputs like a literal backslash before 'n') incl \\uXXXX.
    */
  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
