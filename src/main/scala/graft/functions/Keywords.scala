package graft.functions

/** Keyword metadata — the Spark equivalent of /etc/ca-table/keywords.yaml
  * (/root/reference/src/keywords.cc:20-58, keywords.h:18-45): two lists of
  * prefix-or-regex filters classifying keywords as `timestamped` (score
  * values are epoch-days dates; drives date-formatted threshold headers,
  * query.cc:762) or `ephemeral` (values change daily; drives CORRELATE
  * leakage filtering, correlate.cc:486-491).
  *
  * Filter syntax follows the reference's config convention
  * (keywords.cc:28-35): an entry wrapped in slashes (`/re/`) is a regular
  * expression matched against the FULL keyword (RE2::FullMatch,
  * keywords.cc:66-68); anything else is a literal prefix. Filters load from
  * the file named by GRAFT_KEYWORDS (a minimal YAML subset — `ephemeral:` /
  * `timestamped:` headers with `- "entry"` items); without it, the defaults
  * mirror the testdata fixture classes. The FILTER LISTS are config-sized
  * (dozens of entries), but the key vocabulary they classify is not — at
  * corpus scale it is every indexed keyword — so classification compiles to
  * column predicates (`timestampedCol`/`ephemeralCol`) evaluated inside the
  * scan, never by collecting keys to the driver. Prefix filters become
  * StartsWith (pushed to parquet min/max); anchored regexes inherit
  * RegexPrefixPushdown's derived prefix.
  */
object Keywords {

  sealed trait Filter { def matches(key: String): Boolean }
  private final case class PrefixFilter(prefix: String) extends Filter {
    def matches(key: String): Boolean = key.startsWith(prefix)
  }
  private final case class RegexFilter(re: java.util.regex.Pattern) extends Filter {
    def matches(key: String): Boolean = re.matcher(key).matches() // full match
  }

  /** `/re/` → regex (full match), else prefix (keywords.cc:28-35). */
  def parseFilter(expr: String): Filter =
    if (expr.length > 2 && expr.startsWith("/") && expr.endsWith("/"))
      RegexFilter(java.util.regex.Pattern.compile(
        expr.substring(1, expr.length - 1)))
    else PrefixFilter(expr)

  /** Minimal parser for the reference config shape: two top-level keys, each
    * a sequence of scalar entries (quoted or bare). */
  def parseConfig(text: String): (Seq[Filter], Seq[Filter]) = {
    var section: String = ""
    val eph = Seq.newBuilder[Filter]
    val ts = Seq.newBuilder[Filter]
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        // list-item check FIRST: a bare prefix entry ending in ':' (the
        // normal shape for `- event:`) would otherwise be misparsed as a
        // section header, dropping it AND rerouting every later entry
        // into the bogus section (review finding, r19)
        if (line.startsWith("-")) {
          val v = line.drop(1).trim.stripPrefix("\"").stripSuffix("\"")
          if (v.nonEmpty) section match {
            case "ephemeral" => eph += parseFilter(v)
            case "timestamped" => ts += parseFilter(v)
            case _ => ()
          }
        } else if (line.endsWith(":")) section = line.dropRight(1).trim
      }
    }
    (eph.result(), ts.result())
  }

  /** Load + parse a keywords config file — the exact code path the
    * GRAFT_KEYWORDS env-var init takes, exposed so tests can round-trip a
    * written file without faking process env. */
  def loadConfig(path: String): (Seq[Filter], Seq[Filter]) =
    parseConfig(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))

  private lazy val (ephemeral: Seq[Filter], timestamped: Seq[Filter]) =
    sys.env.get("GRAFT_KEYWORDS") match {
      case Some(path) => loadConfig(path)
      case None =>
        // testdata fixture classes (FIXTURES.md A.3)
        (Seq(parseFilter("event:")),
          Seq(parseFilter("orderdate"), parseFilter("shipdate"),
            parseFilter("event:")))
    }

  /** Keyword families whose postings carry percentile bands (the four pct
    * floats of the universal value, /root/reference/src/ca-table.h:102-105).
    * Classified statically — like `timestamped` — so the compiler knows at
    * plan time whether a leaf's posting schema includes band columns. */
  private val banded: Seq[Filter] = Seq(parseFilter("priceband"))

  def isTimestamped(key: String): Boolean = timestamped.exists(_.matches(key))

  def isEphemeral(key: String): Boolean = ephemeral.exists(_.matches(key))

  def hasPctBands(key: String): Boolean = banded.exists(_.matches(key))

  /** The same classification as `isTimestamped`/`isEphemeral`, compiled to a
    * Column predicate: prefix filters → startsWith (parquet-pushable),
    * regex filters → rlike anchored with \A...\z to reproduce
    * Matcher.matches()/RE2::FullMatch (keywords.cc:66-68) exactly — ^...$
    * would also match before a trailing line terminator, classifying a
    * newline-bearing key differently from the scalar path. An empty filter
    * list compiles to `false`. */
  private[graft] def toPredicate(filters: Seq[Filter],
      keyCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filters.map {
      case PrefixFilter(p) => keyCol.startsWith(p)
      case RegexFilter(re) => keyCol.rlike("\\A(?:" + re.pattern + ")\\z")
    }.foldLeft(org.apache.spark.sql.functions.lit(false))(_ || _)

  def timestampedCol(keyCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toPredicate(timestamped, keyCol)

  def ephemeralCol(keyCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    toPredicate(ephemeral, keyCol)
}
