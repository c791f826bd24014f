package graft

import graft.exec.Presenter
import graft.model.{Catalog, Tables}
import graft.parser.Parser
import org.apache.spark.sql.SparkSession

/** The ca-shell equivalent (/root/reference/src/ca-shell.cc:100-219): execute
  * statements from `-c "script"`, an interactive per-line loop (stdin is a
  * console, or `-i`), or a piped stdin script.
  *
  * Usage: Shell <sfDir> [-c "QUERY ...; SELECT ...;"] | [-i]
  */
object Shell {

  /** Parse and execute one script fragment; statement failures print the
    * error envelope and do not abort the fragment (parse errors cover the
    * whole fragment, like the reference's stdout_error catch,
    * ca-shell.cc:211-216 / query.cc:943-947). */
  def runScript(spark: SparkSession, t: Tables, state: Presenter.SessionState,
      script: String): Unit =
    try {
      for (stmt <- Parser.parseStatements(script)) {
        val out =
          try Presenter.execute(spark, t, state, stmt)
          catch { case e: Exception => Presenter.errorEnvelope(e.getMessage) }
        if (out.nonEmpty) println(out)
      }
    } catch {
      case e: Exception => println(Presenter.errorEnvelope(e.getMessage))
    }

  /** The interactive loop (ca-shell.cc:163-199): one prompt per line, empty
    * lines skipped, a failed line prints its envelope and the loop continues,
    * EOF exits. The prompt goes to stderr so piped/captured stdout stays pure
    * statement output. */
  def repl(spark: SparkSession, t: Tables, state: Presenter.SessionState,
      in: java.io.BufferedReader): Unit = {
    var line = ""
    while ({
      Console.err.print("[ca-table]$ "); Console.err.flush()
      line = in.readLine(); line != null
    }) {
      if (line.trim.nonEmpty) runScript(spark, t, state, line)
    }
    Console.err.println()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val t = Catalog.tables(spark, sfDir)
    val state = new Presenter.SessionState
    try {
      if (args.length >= 3 && args(1) == "-c") runScript(spark, t, state, args(2))
      else if (args.contains("-i") || System.console() != null)
        repl(spark, t, state,
          new java.io.BufferedReader(new java.io.InputStreamReader(System.in)))
      else runScript(spark, t, state, scala.io.Source.stdin.mkString)
    } finally spark.stop()
  }
}
