package graft.functions

/** Keyword metadata — the Spark stand-in for /etc/ca-table/keywords.yaml
  * (/root/reference/src/keywords.cc:51-58, keywords.h:38-44): prefix filters
  * classifying keywords as `timestamped` (score values are epoch-days dates,
  * drives date-formatted threshold headers, query.cc:762) or `ephemeral`
  * (values change daily; drives CORRELATE leakage filtering,
  * correlate.cc:486-491).
  *
  * The reference loads these from a yaml config; our derived index has a fixed
  * keyword vocabulary, so the classes are declared here. A production
  * deployment would read them from a config table and broadcast.
  */
object Keywords {

  private val timestampedPrefixes = Seq("orderdate", "shipdate", "event:")
  private val ephemeralPrefixes = Seq("event:")

  def isTimestamped(key: String): Boolean =
    timestampedPrefixes.exists(key.startsWith)

  def isEphemeral(key: String): Boolean =
    ephemeralPrefixes.exists(key.startsWith)
}
