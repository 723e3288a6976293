package graft.sydraql

/** Hand-rolled lexer for sydraQL (token surface:
  * `/root/reference/src/sydra/query/lexer.zig:6-74`). Keywords are
  * case-insensitive; identifiers may be dotted (`tag.host`,
  * `weather.room1`); strings are single-quoted with `''` escape
  * (`parser.zig:653-669`); no duration tokens exist — time steps are plain
  * integers (SURVEY.md §1.2).
  */
object Lexer {

  sealed trait Token { def pos: Int }
  final case class TIdent(value: String, pos: Int) extends Token
  final case class TKeyword(value: String, pos: Int) extends Token
  final case class TInt(value: Long, pos: Int) extends Token
  final case class TFloat(value: Double, pos: Int) extends Token
  final case class TString(value: String, pos: Int) extends Token
  final case class TSym(value: String, pos: Int) extends Token
  final case class TEof(pos: Int) extends Token

  val keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "fill", "order", "asc", "desc",
    "limit", "offset", "insert", "into", "values", "delete", "explain",
    "and", "or", "not", "null", "true", "false", "as")

  def tokenize(input: String): Seq[Token] = {
    val out = Seq.newBuilder[Token]
    var i = 0
    val n = input.length
    def err(msg: String, pos: Int): Nothing =
      throw QueryError(QueryError.InvalidSyntax, msg, pos)
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '-' && i + 1 < n && input.charAt(i + 1) == '-') {
        // line comment
        while (i < n && input.charAt(i) != '\n') i += 1
      } else if (c.isDigit) {
        val start = i
        while (i < n && input.charAt(i).isDigit) i += 1
        var isFloat = false
        if (i < n && input.charAt(i) == '.' && i + 1 < n && input.charAt(i + 1).isDigit) {
          isFloat = true; i += 1
          while (i < n && input.charAt(i).isDigit) i += 1
        }
        if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
          val save = i
          i += 1
          if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
          if (i < n && input.charAt(i).isDigit) {
            isFloat = true
            while (i < n && input.charAt(i).isDigit) i += 1
          } else i = save
        }
        val text = input.substring(start, i)
        if (isFloat) out += TFloat(text.toDouble, start)
        else out += TInt(text.toLong, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        def ident(): Unit = {
          while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_')) i += 1
        }
        ident()
        // dotted continuation: `a.b.c` is one identifier token
        while (i + 1 < n && input.charAt(i) == '.' &&
            (input.charAt(i + 1).isLetter || input.charAt(i + 1) == '_')) {
          i += 1; ident()
        }
        val text = input.substring(start, i)
        val lower = text.toLowerCase
        if (keywords.contains(lower) && !text.contains('.')) out += TKeyword(lower, start)
        else out += TIdent(text, start)
      } else if (c == '\'') {
        val start = i
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && input.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += ch; i += 1 }
        }
        if (!closed) err("unterminated string literal", start)
        out += TString(sb.toString, start)
      } else {
        val start = i
        def two(s: String): Boolean =
          i + 1 < n && input.substring(i, i + 2) == s
        if (two("!=") || two("<=") || two(">=") || two("=~") || two("!~") || two("&&") || two("||")) {
          val s = input.substring(i, i + 2)
          out += TSym(if (s == "&&") "and" else if (s == "||") "or" else s, start)
          i += 2
        } else if ("+-*/%=<>(),.".indexOf(c) >= 0) {
          out += TSym(c.toString, start); i += 1
        } else err(s"unexpected character '$c'", start)
      }
    }
    out += TEof(n)
    out.result()
  }
}
