package graft

import org.apache.spark.sql.SparkSession

/** The extensions class must light up the function library in a fresh
  * session with zero manual registration — the deployment contract.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers every " +
      "function in a fresh session") {
    spark // ensure the shared context exists first
    // spark.sql.extensions is a STATIC conf read from the SparkContext at
    // first-session build — on a shared test context use the programmatic
    // form, which is the same GraftExtensions contract.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s2.sql(
        """SELECT fnv64('a') AS h,
                  simhash64(array('x', 'y')) AS sh,
                  size(minhash_sig(array('x'), 16)) AS mh,
                  size(winnow_fingerprint('abcdefghijklmnop')) AS wf,
                  to_extended_json(struct('v' as k)) AS ej""").head()
      assert(row.getLong(0) == 0xaf63dc4c8601ec8cL)
      assert(row.getInt(2) == 16)
      assert(row.getInt(3) >= 1)
      assert(row.getString(4) == """{"k":"v"}""")
      val agg = s2.sql(
        """SELECT simhash_agg(split(t, ' ')) FROM
           VALUES ('a b c'), ('a b d') AS v(t)""").head()
      assert(agg.getLong(0) != 0L)
    } finally {
      // keep the shared suite session; only drop this one's state
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
