package graft.sources

import scala.util.matching.Regex

/** XML element-name encoding for raw business column names
  * ("No.", "Currency Code", "2. Priority", …), the analog of
  * Codeunit 60000 - Config. XML Exchange.al:925 `GetElementName`.
  *
  * Scheme: ECMA-376's `_xHHHH_` escapes. Any character outside
  * `[A-Za-z0-9_]` — and a digit in leading position — is written as
  * `_x` + 4 hex digits + `_`; an original `_` that itself starts an
  * `_x` sequence is escaped as `_x005F_` so decoding is unambiguous.
  * `decode(encode(s)) == s` for every string (property-tested).
  */
object XmlNames {

  private def hex(c: Char): String = f"_x${c.toInt}%04X_"

  def encode(name: String): String = {
    val b = new StringBuilder(name.length + 8)
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      val plain = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9' && i > 0)
      if (c == '_' && i + 1 < name.length && name.charAt(i + 1) == 'x')
        b.append("_x005F_")
      else if (plain || (c == '_')) b.append(c)
      else b.append(hex(c))
      i += 1
    }
    b.toString
  }

  private val Esc: Regex = "_x([0-9A-Fa-f]{4})_".r

  def decode(name: String): String =
    Esc.replaceAllIn(name, m => Regex.quoteReplacement(
      Integer.parseInt(m.group(1), 16).toChar.toString))
}
