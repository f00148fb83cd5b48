package graft.gen

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TransactionGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tx = TransactionGen.transactions(spark, 5000).cache()

  test("wire schema matches the reference record shape (FIXTURES.md A1)") {
    val names = tx.schema.fieldNames.toSeq
    assert(names == Seq("nome", "cpf", "valor", "bandeira", "numero_cartao",
      "cvv", "exp", "tipo_cartao", "cor_cartao", "tipo_transacao",
      "localizacao", "horario_transacao", "transaction_id"))
    assert(tx.schema("localizacao").dataType.typeName == "struct")
  }

  test("valor bounds and 2dp rounding (app.py:65)") {
    val mm = tx.agg(min("valor"), max("valor")).head()
    assert(mm.getDouble(0) >= 1.0 && mm.getDouble(1) <= 9999.0)
    val bad = tx.where(round(col("valor"), 2) =!= col("valor")).count()
    assert(bad == 0)
  }

  test("CPF check digits are valid mod-11 (app.py:48-53)") {
    val rows = tx.select("cpf").limit(500).as[String].collect()
    rows.foreach { cpf =>
      assert(cpf.length == 11, s"cpf $cpf")
      val d = cpf.map(_ - '0')
      val v1 = (d.take(9).zip(10 to 2 by -1).map { case (x, w) => x * w }.sum * 10) % 11 % 10
      val v2 = (d.take(10).zip(11 to 2 by -1).map { case (x, w) => x * w }.sum * 10) % 11 % 10
      assert(d(9) == v1 && d(10) == v2, s"cpf $cpf check digits wrong")
    }
  }

  test("weighted categoricals land near their weights (app.py:24-30)") {
    val n = tx.count().toDouble
    val freq = tx.groupBy("tipo_transacao").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(freq("credito") - 0.65) < 0.05, s"credito ${freq("credito")}")
    val standard = tx.where($"tipo_cartao" === "standard").count() / n
    assert(math.abs(standard - 0.35) < 0.05, s"standard $standard")
  }

  test("deterministic: same seed same rows, different seed different rows") {
    val a = TransactionGen.transactions(spark, 100).select("transaction_id", "valor")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val b = TransactionGen.transactions(spark, 100).select("transaction_id", "valor")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val c = TransactionGen.transactions(spark, 100, seed = 7).select("transaction_id", "valor")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(a == b)
    assert(a != c)
  }

  test("stage mapping flattens localizacao with casts; spec drops PII and aggregates") {
    val st = TransactionGen.stage(tx)
    assert(st.columns.contains("cidade") && st.columns.contains("estado"))
    assert(st.schema("latitude").dataType.typeName == "double")
    val sp = TransactionGen.spec(st)
    assert(!sp.columns.contains("nome") && !sp.columns.contains("cvv"))
    assert(sp.columns.contains("sum_valor"))
    // sum over spec == sum over stage (aggregation loses no value)
    val total = sp.agg(round(sum("sum_valor"), 2)).head().getDouble(0)
    val expected = st.agg(round(sum("valor"), 2)).head().getDouble(0)
    assert(math.abs(total - expected) < 0.01)
  }

  test("streamingTransactions emits the wire schema from the rate source") {
    val q = TransactionGen.streamingTransactions(spark, rowsPerSecond = 200)
      .writeStream.outputMode("append").format("memory")
      .queryName("gen_stream").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
      val got = spark.table("gen_stream")
      assert(got.columns.toSeq === TransactionGen.transactions(spark, 1).columns.toSeq)
      val rows = got.count()
      assert(rows > 0, "rate source should have produced rows")
    } finally q.stop()
  }
}
