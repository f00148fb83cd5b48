package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator — the Spark-native
  * rebuild of the reference's producer (SURVEY.md §2.1 S11,
  * `generator_app/app.py:55-83`): weighted categoricals, CPF check
  * digits (mod-11, `app.py:48-53`), nested `localizacao` struct, ISO
  * event time, unique transaction id.
  *
  * Instead of Faker + wall-clock (1 rec/s, `app.py:89-91`), rows derive
  * from `spark.range(n)` + per-column `rand(seed)` — deterministic,
  * parallel, and rate-unlimited. F9's uuid4 becomes a content-derived
  * deterministic id; F10's weighted choice is a CDF over `rand`;
  * F11's CPF check digits are computed with builtin arithmetic (no UDF).
  */
object TransactionGen {

  /** Weighted categorical: pick by CDF walk over a rand() draw
    * (generator_app/app.py:70-72's weighted lists).
    */
  def weightedChoice(r: Column, choices: Seq[(String, Int)]): Column = {
    val total = choices.map(_._2).sum.toDouble
    val cdf = choices.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    choices.zip(cdf).init.foldRight(lit(choices.last._1): Column) {
      case (((v, _), p), rest) => when(r < p, lit(v)).otherwise(rest)
    }
  }

  val TipoCartao: Seq[(String, Int)] = Seq(
    "unlimited" -> 5, "black" -> 15, "platinum" -> 20, "gold" -> 25, "standard" -> 35)
  val CorCartao: Seq[(String, Int)] = Seq(
    "preto" -> 5, "prata" -> 15, "amarelo" -> 20, "azul" -> 25, "verde" -> 35)
  val TipoTransacao: Seq[(String, Int)] = Seq("credito" -> 65, "debito" -> 35)
  val Bandeiras: Seq[(String, Int)] = Seq(
    "Mastercard" -> 30, "Visa" -> 30, "Amex" -> 20, "Elo" -> 20)
  val Estados: Seq[(String, Int)] = Seq(
    "SP" -> 30, "RJ" -> 20, "MG" -> 15, "RS" -> 15, "BA" -> 20)

  /** CPF check digits (mod-11 over 9 base digits, then over 10 —
    * generator_app/app.py:48-53) from pure column arithmetic: digit i of
    * the 9-digit base, weighted sums, `(sum * 10) % 11 % 10`.
    */
  def cpfColumn(base9: Column): Column = {
    def digit(i: Int): Column = pmod(floor(base9 / math.pow(10, 8 - i)), lit(10)).cast("int")
    val d = (0 until 9).map(digit)
    val s1 = d.zipWithIndex.map { case (di, i) => di * (10 - i) }.reduce(_ + _)
    val v1 = pmod(pmod(s1 * 10, lit(11)), lit(10)).cast("int")
    val s2 = (d :+ v1).zipWithIndex.map { case (di, i) => di * (11 - i) }.reduce(_ + _)
    val v2 = pmod(pmod(s2 * 10, lit(11)), lit(10)).cast("int")
    concat(lpad(base9.cast("long").cast("string"), 9, "0"),
      v1.cast("string"), v2.cast("string"))
  }

  /** `n` deterministic transactions in the reference wire schema
    * (SURVEY.md §1.1 / FIXTURES.md §A1). Same seed → same rows,
    * independent of parallelism (all columns derive from `id`-seeded
    * hashes, not task-local PRNG streams).
    */
  def transactions(spark: SparkSession, n: Long, seed: Long = 42L,
                   startEpoch: Long = 1704067200L /* 2024-01-01 */): DataFrame =
    wireFromIds(spark.range(n).toDF(), seed, startEpoch)

  /** Streaming form of the generator (S11 as a stream): the rate source
    * plays the reference's Fargate producer (1 rec/s —
    * `generator_app/app.py:89-91`, `generator_stack.py:12`); every wire
    * column derives from the same id-hash expressions as the batch
    * form, so batch and stream emit identical records for equal ids.
    */
  def streamingTransactions(spark: SparkSession, rowsPerSecond: Int = 1,
                            seed: Long = 42L,
                            startEpoch: Long = 1704067200L): DataFrame =
    wireFromIds(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load()
        .select(col("value").as("id")),
      seed, startEpoch)

  /** Wire-schema columns over any frame with an `id` long column. */
  def wireFromIds(ids: DataFrame, seed: Long, startEpoch: Long): DataFrame = {
    // per-column deterministic uniform [0,1) from xxhash64(id, salt):
    // rand(seed) is partition-dependent; hashing the row id is not.
    def u(salt: Int): Column =
      (pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000007L))
        .cast("double") / lit(1000000007.0))

    ids.select(
      col("id"),
      concat(lit("cliente_"), col("id").cast("string")).as("nome"),
      cpfColumn(floor(u(1) * 1e9)).as("cpf"),
      round(lit(1.0) + u(2) * lit(9998.0), 2).as("valor"),
      weightedChoice(u(3), Bandeiras).as("bandeira"),
      lpad(pmod(xxhash64(col("id"), lit(seed), lit(4)), lit(10000000000000000L))
        .cast("string"), 16, "0").as("numero_cartao"),
      lpad(pmod(xxhash64(col("id"), lit(seed), lit(5)), lit(1000L))
        .cast("string"), 3, "0").as("cvv"),
      concat(lpad((pmod(xxhash64(col("id"), lit(seed), lit(6)), lit(12L)) + 1)
        .cast("string"), 2, "0"), lit("/"),
        (pmod(xxhash64(col("id"), lit(seed), lit(7)), lit(5L)) + 25).cast("string"))
        .as("exp"),
      weightedChoice(u(8), TipoCartao).as("tipo_cartao"),
      weightedChoice(u(9), CorCartao).as("cor_cartao"),
      weightedChoice(u(10), TipoTransacao).as("tipo_transacao"),
      struct(
        format_number(u(11) * lit(-30.0), 6).as("lat"),
        format_number(u(12) * lit(-70.0), 6).as("lng"),
        concat(lit("cidade_"), pmod(xxhash64(col("id"), lit(seed), lit(13)), lit(50L))
          .cast("string")).as("cidade"),
        weightedChoice(u(14), Estados).as("estado")).as("localizacao"),
      date_format(
        timestamp_seconds(lit(startEpoch) + pmod(xxhash64(col("id"), lit(seed), lit(15)),
          lit(30L * 24 * 3600))),
        "yyyy-MM-dd'T'HH:mm:ss").as("horario_transacao"),
      md5(concat(col("id").cast("string"), lit(seed.toString))).as("transaction_id")
    ).drop("id")
  }

  /** The reference's stage mapping (P1/P2, `stage.py:25-48`) applied to
    * the wire schema: nested extraction, string→double casts, rename,
    * partition-column derivation (S8).
    */
  def stage(wire: DataFrame): DataFrame = {
    import graft.etl.Mapping._
    import org.apache.spark.sql.types._
    applyMapping(wire, Seq(
      FieldMapping("nome", "nome"),
      FieldMapping("cpf", "cpf"),
      FieldMapping("valor", "valor", DoubleType),
      FieldMapping("bandeira", "bandeira"),
      FieldMapping("numero_cartao", "numero_cartao"),
      FieldMapping("cvv", "cvv"),
      FieldMapping("exp", "exp"),
      FieldMapping("tipo_cartao", "tipo_cartao"),
      FieldMapping("cor_cartao", "cor_cartao"),
      FieldMapping("tipo_transacao", "tipo_transacao"),
      FieldMapping("localizacao.cidade", "cidade"),
      FieldMapping("localizacao.estado", "loc-estado"),
      FieldMapping("localizacao.lat", "latitude", DoubleType),
      FieldMapping("localizacao.lng", "longitude", DoubleType),
      FieldMapping("horario_transacao", "horario_transacao"),
      FieldMapping("localizacao.estado", "estado")))
  }

  /** The reference's spec aggregation (P3 + A3, `spec.py:40-64`): drop
    * PII, group by the 10 dimension columns, sum(valor).
    */
  def spec(stage: DataFrame): DataFrame = {
    import graft.etl.{Aggregation, Mapping}
    // literal parity: spec.py:42 drops exactly nome and cvv (cpf falls
    // out via the groupBy projection)
    val noPii = Mapping.dropFields(stage, "nome", "cvv")
    Aggregation.sparkAggregate(noPii,
      Seq("bandeira", "numero_cartao", "exp", "tipo_cartao", "cor_cartao",
        "tipo_transacao", "cidade", "latitude", "longitude", "estado"),
      Seq(Aggregation.AggSpec("valor", "sum", Some("sum_valor"))))
  }
}
