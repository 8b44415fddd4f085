package graft

/** S12: the SQL entry point. The reference bootstraps its warehouse with
  * idempotent DDL (`database/schema.py:119-131` — CREATE SCHEMA/TABLE IF
  * NOT EXISTS); the Spark-native analogue is registering the star schema
  * as temp views so `spark.sql(...)` works against the same tables the
  * function surface reads.
  */
class CatalogSpec extends SparkSpec {

  test("registerAll: every table queryable through spark.sql, idempotent " +
    "re-register (schema.py:119-131)") {
    Tables.registerAll(spark, sfDir)
    // idempotence: second registration is a silent no-op (view replaced
    // with the same definition), like the reference's IF NOT EXISTS DDL
    Tables.registerAll(spark, sfDir)
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) > 0,
        s"view $t empty or missing")
    }
    // the events view must carry the converted microsecond timestamp, not
    // the raw nanos long (the TIMESTAMP(NANOS) quirk handled in SQL too)
    assert(spark.sql("SELECT ts FROM events").schema.head.dataType.typeName
      === "timestamp")
  }

  test("SQL twin: q_funnel's oracle text through spark.sql matches the " +
    "DataFrame form exactly") {
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(SparkEntry.oracleSql("q_funnel"))
    val viaDf = SparkEntry.queries("q_funnel")(spark, sfDir)
    val cols = viaSql.columns.sorted
    assert(cols === viaDf.columns.sorted)
    val a = viaSql.select(cols.head, cols.tail: _*)
      .collect().map(_.toString).toSeq
    val b = viaDf.select(cols.head, cols.tail: _*)
      .collect().map(_.toString).toSeq
    assert(a === b)
  }
}
