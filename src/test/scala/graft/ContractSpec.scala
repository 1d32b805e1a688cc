package graft

/** Driver-contract invariants (SparkEntry scaladoc):
  *  - every oracleSql key has a queries entry;
  *  - every query runs at sf0.001 and yields rows with distinct column names
  *    (the driver sorts columns by name before hashing — duplicates would
  *    silently corrupt the compare);
  *  - the flagship entry() returns rows > 0 (the driver's smoke check).
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
  }

  test("flagship entry() returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 with unique column names") {
    // (zero rows is legal for near-dup thresholds at tiny SF; the driver's
    // rows>0 smoke applies only to entry())
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        val cols = df.columns.toSeq
        val dups = cols.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
        df.count()
        if (dups.nonEmpty) Some(s"$name: duplicate columns $dups") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
