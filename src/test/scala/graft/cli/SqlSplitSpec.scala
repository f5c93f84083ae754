package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** The CLI `sql` surface takes a SCRIPT: statements split on ';'
  * outside single-quoted literals, so one JVM drives a whole
  * create→insert→branch→publish flow.
  */
class SqlSplitSpec extends AnyFunSuite {

  test("statements split on top-level semicolons; blanks dropped") {
    assert(AzofCli.splitSql("SELECT 1; SELECT 2;") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(AzofCli.splitSql("  SELECT 1  ") == Seq("SELECT 1"))
    assert(AzofCli.splitSql(";;") == Seq.empty)
  }

  test("semicolons inside single-quoted literals do not split") {
    assert(AzofCli.splitSql("INSERT INTO t VALUES ('a;b'); SELECT 1") ==
      Seq("INSERT INTO t VALUES ('a;b')", "SELECT 1"))
  }

  test("ANSI doubled-quote escape keeps the literal open across ';'") {
    assert(AzofCli.splitSql("SELECT 'it''s; fine'; SELECT 2") ==
      Seq("SELECT 'it''s; fine'", "SELECT 2"))
  }
}
