package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Parser for the reference's partition-filter string grammar
  * (cascading/hcatalog/HCatTap.java:79-85): operators `and or like ( ) =
  * <> < > <= >=`, e.g. `"ds=20120401"` or `"ds>=20120401 and (h=1 or h=2)"`.
  *
  * The reference evaluates the string in the Hive metastore
  * (listPartitionsByFilter, CascadingHCatUtil.java:75-95); here it becomes a
  * Catalyst `Column` predicate, which PruneFileSourcePartitions (or Hive
  * metastorePartitionPruning for catalog tables) pushes to partition pruning —
  * same files-never-opened effect.
  */
object PartitionFilter {

  def parse(s: String): Column = new Parser(s).parseAll()

  private sealed trait Tok
  private case class Ident(v: String)  extends Tok
  private case class StrLit(v: String) extends Tok
  private case class NumLit(v: String) extends Tok
  private case class Op(v: String)     extends Tok // = <> < > <= >= ( )
  private case object AndTok           extends Tok
  private case object OrTok            extends Tok
  private case object LikeTok          extends Tok

  private final class Parser(input: String) {
    private val toks = tokenize(input)
    private var pos  = 0

    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = {
      require(pos < toks.length, s"unexpected end of filter '$input'")
      val t = toks(pos); pos += 1; t
    }

    def parseAll(): Column = {
      val c = parseOr()
      require(pos == toks.length, s"trailing tokens in filter: '$input' at $pos")
      c
    }

    // or-expr := and-expr (OR and-expr)*
    private def parseOr(): Column = {
      var l = parseAnd()
      while (peek.contains(OrTok)) { next(); l = l || parseAnd() }
      l
    }

    // and-expr := cmp (AND cmp)*
    private def parseAnd(): Column = {
      var l = parseCmp()
      while (peek.contains(AndTok)) { next(); l = l && parseCmp() }
      l
    }

    // cmp := '(' or-expr ')' | ident (op literal | LIKE string)
    private def parseCmp(): Column = peek match {
      case Some(Op("(")) =>
        next()
        val c = parseOr()
        require(next() == Op(")"), s"expected ')' in filter: '$input'")
        c
      case Some(Ident(name)) =>
        next()
        val lhs = col(name)
        next() match {
          case Op("=")  => lhs === literal()
          case Op("<>") => lhs =!= literal()
          case Op("<")  => lhs < literal()
          case Op(">")  => lhs > literal()
          case Op("<=") => lhs <= literal()
          case Op(">=") => lhs >= literal()
          case LikeTok  => likeRhs(lhs)
          case t        => throw new IllegalArgumentException(
            s"expected comparison operator after '$name', got $t in '$input'")
        }
      case t => throw new IllegalArgumentException(
        s"unexpected token $t in filter '$input'")
    }

    private def likeRhs(lhs: Column): Column = next() match {
      case StrLit(v) => lhs.like(v)
      case Ident(v)  => lhs.like(v)
      case NumLit(v) => lhs.like(v)
      case t => throw new IllegalArgumentException(s"bad LIKE pattern: $t")
    }

    private def literal(): Column = next() match {
      case StrLit(v) => lit(v)
      // Partition values are strings in the metastore; keep numeric literals
      // as strings too so `ds=20120401` compares against string partition
      // columns the way the metastore does. Catalyst casts as needed.
      case NumLit(v) => lit(v)
      case Ident(v)  => lit(v) // bare word treated as unquoted string value
      case t => throw new IllegalArgumentException(s"expected literal, got $t")
    }

    private def tokenize(s: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < s.length) {
        val c = s(i)
        if (c.isWhitespace) i += 1
        else if (c == '(' || c == ')') { out += Op(c.toString); i += 1 }
        else if (c == '<') {
          if (i + 1 < s.length && (s(i + 1) == '>' || s(i + 1) == '=')) {
            out += Op(s.substring(i, i + 2)); i += 2
          } else { out += Op("<"); i += 1 }
        } else if (c == '>') {
          if (i + 1 < s.length && s(i + 1) == '=') { out += Op(">="); i += 2 }
          else { out += Op(">"); i += 1 }
        } else if (c == '=') { out += Op("="); i += 1 }
        else if (c == '\'' || c == '"') {
          val end = s.indexOf(c, i + 1)
          require(end >= 0, s"unterminated string literal in '$s'")
          out += StrLit(s.substring(i + 1, end)); i = end + 1
        } else if (c.isDigit || (c == '-' && i + 1 < s.length && s(i + 1).isDigit)) {
          val start = i
          i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          out += NumLit(s.substring(start, i))
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
          s.substring(start, i).toLowerCase match {
            case "and"  => out += AndTok
            case "or"   => out += OrTok
            case "like" => out += LikeTok
            case _      => out += Ident(s.substring(start, i))
          }
        } else throw new IllegalArgumentException(s"bad char '$c' in filter '$s'")
      }
      out.result()
    }
  }
}
