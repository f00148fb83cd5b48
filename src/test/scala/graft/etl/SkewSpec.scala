package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class SkewSpec extends SparkSpec {

  test("saltedEquiJoin is row-identical to the plain equi-join") {
    val e = Tables.events(spark, sf()).select("event_id", "user_id", "value")
    val c = Tables.customer(spark, sf()).select("c_custkey", "c_name")
    val salted = Skew.saltedEquiJoin(e, c, "user_id", "c_custkey", numSalts = 8)
      .select("event_id", "user_id", "c_custkey", "c_name")
    val plain = e.join(c, e("user_id") === c("c_custkey"))
      .select("event_id", "user_id", "c_custkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt spreads a hot key over multiple shuffle sub-keys") {
    import spark.implicits._
    // one key carries 1000 rows (hot), others 1 row each
    val hot = (1 to 1000).map(i => (42L, i.toDouble)) ++ Seq((1L, 1.0), (2L, 2.0))
    val large = hot.toDF("k", "v").repartition(8)
    val small = Seq((42L, "hot"), (1L, "a"), (2L, "b")).toDF("k2", "name")
    val out = Skew.saltedEquiJoin(large, small, "k", "k2", numSalts = 8)
    assert(out.count() === 1002)
    // the salted large side must actually use >1 distinct salt for the hot key
    val salts = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .where($"k" === 42L).select("__salt").distinct().count()
    assert(salts > 1)
  }
}
