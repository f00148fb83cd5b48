package graft.queries

/** Scratch parquet locations for the aux-oracle pattern (queries that
  * materialize a hash-dependent intermediate so DuckDB can verify the
  * exact downstream stage).
  *
  * Paths are a pure function of the scale-factor directory, so a Verify
  * run at sf0.01 and a Bench run at sf0.1 can execute concurrently
  * without clobbering each other's aux files. The root is overridable
  * via GRAFT_ORACLE_AUX_ROOT for fully disjoint sandboxes.
  */
object OracleAux {
  private val root: String =
    sys.env.getOrElse("GRAFT_ORACLE_AUX_ROOT", "/tmp/graft_oracle_aux")

  /** Aux directory for `name` under the namespace derived from sfDir. */
  def dir(sfDir: String, name: String): String =
    s"$root/${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}/$name"

  /** The sfDir the oracle SQL is rendered against. oracleSql is a plain
    * Map[String, String] (no sfDir parameter in the driver contract), so
    * the mains that dump it (Verify) or need parity (check scripts) set
    * this to the same sfDir the queries just ran with.
    */
  @volatile var sqlSfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

  /** Aux path as it must appear inside DuckDB oracle SQL. */
  def sqlDir(name: String): String = dir(sqlSfDir, name)
}
