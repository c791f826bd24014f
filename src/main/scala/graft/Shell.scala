package graft

import graft.exec.Presenter
import graft.model.Catalog
import graft.parser.Parser

/** The ca-shell equivalent (/root/reference/src/ca-shell.cc:100-219): parse
  * statements from `-c "script"` or stdin and execute each against the
  * catalog derived from the given sf dir.
  *
  * Usage: Shell <sfDir> [-c "QUERY ...; SELECT ...;"]
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val script =
      if (args.length >= 3 && args(1) == "-c") args(2)
      else scala.io.Source.stdin.mkString
    val spark = GraftSession.local()
    val t = Catalog.tables(spark, sfDir)
    val state = new Presenter.SessionState
    try {
      for (stmt <- Parser.parseStatements(script)) {
        val out =
          try Presenter.execute(spark, t, state, stmt)
          catch { // error envelope (query.cc:943-947)
            case e: Exception => Presenter.errorEnvelope(e.getMessage)
          }
        if (out.nonEmpty) println(out)
      }
    } finally spark.stop()
  }
}
