package graft.probes

import java.nio.file.Files

import graft.{Probe, Tables}
import graft.engine.InfoSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.2 (sources/sinks beyond parquet) + §2.10 leftovers:
  * CSV/JSON external-table round-trips, COPY TO (df.write), in-memory
  * tables (createDataFrame = DataFusion MemTable), PIVOT, DISTINCT ON,
  * UNION BY NAME, EXPLAIN, SET, information_schema.
  *
  * Round-trip probes write under java.io.tmpdir and read back through the
  * other format's reader — the aggregate over the round-tripped data must
  * equal the oracle computed straight from the parquet source.
  */
object SourcesSinks {

  private val ProbeTables =
    """'region','nation','customer','supplier','part','orders',
      |'lineitem','events','documents','embeddings'""".stripMargin

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  val probes: Seq[Probe] = Seq(

    // CSV sink + CSV scan (integer/string columns only: CSV is not a
    // lossless double format)
    Probe.df("q_csv_roundtrip",
      """SELECT l_returnflag, count(*) AS n, CAST(sum(l_linenumber) AS BIGINT) AS s
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val out = tmp("graft_csv")
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema(StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_linenumber", IntegerType),
          StructField("l_returnflag", StringType))))
        .csv(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_linenumber").as("s"))
        .orderBy("l_returnflag")
    },

    // JSON lines sink + scan
    Probe.df("q_json_roundtrip",
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val out = tmp("graft_json")
      Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.mode("overwrite").json(out)
      s.read.schema(StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_mktsegment", StringType))))
        .json(out)
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // ORC external table round-trip (Spark-native columnar sink + scan,
    // vectorized read path — format parity alongside CSV/JSON/Avro/
    // Parquet; doubles survive ORC exactly, so the oracle sums them too)
    Probe.df("q_orc_roundtrip",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS s,
        |  CAST(sum(o_totalprice) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val out = tmp("graft_orc")
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("s"),
          sum("o_totalprice").as("total"))
        .orderBy("o_orderpriority")
    },

    // Avro external table round-trip via graft.sources.AvroSource (the
    // spark-avro connector jar is absent from /opt/spark/jars — see
    // STATUS.md — so the container format is implemented directly on the
    // shipped Avro core library; distributed write + per-file-partition
    // read)
    Probe.df("q_avro_roundtrip",
      """SELECT c_mktsegment, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS s,
        |  CAST(sum(c_acctbal) AS DOUBLE) AS bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val out = tmp("graft_avro")
      graft.sources.AvroSource.write(
        Tables.load(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal"), out)
      graft.sources.AvroSource.read(s, out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("s"),
          sum("c_acctbal").as("bal"))
        .orderBy("c_mktsegment")
    },

    // XML external table round-trip (Spark 4's BUILT-IN XML source —
    // SPARK-44265 folded the spark-xml connector into spark-sql; the
    // StAX parser classes ship in /opt/spark/jars, javap-verified).
    // rowTag schema inference is exercised on write+read; integers and
    // strings only (XML text nodes are not a lossless double format,
    // same caveat as CSV).
    Probe.df("q_xml_roundtrip",
      """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS s
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
      val out = tmp("graft_xml")
      Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_regionkey", "n_name")
        .write.mode("overwrite").option("rowTag", "nation")
        .format("xml").save(out)
      s.read.option("rowTag", "nation")
        .schema(StructType(Seq(
          StructField("n_nationkey", LongType),
          StructField("n_regionkey", LongType),
          StructField("n_name", StringType))))
        .format("xml").load(out)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), sum("n_nationkey").as("s"))
        .orderBy("n_regionkey")
    },

    // COPY TO semantics: export query → parquet files → scan back
    Probe.df("q_copy_to",
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > 150000") { (s, dir) =>
      val out = tmp("graft_copy")
      Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 150000)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).agg(count(lit(1)).as("n"))
    },

    // in-memory table (DataFusion MemTable / VALUES equivalence)
    Probe.df("q_memtable",
      """SELECT k, v FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) t(k, v)
        |ORDER BY k""".stripMargin) { (s, _) =>
      import s.implicits._
      Seq((1, "alpha"), (2, "beta"), (3, "gamma")).toDF("k", "v").orderBy("k")
    },

    // PIVOT (Spark native syntax; oracle via portable CASE aggregation)
    Probe.sql2("q_pivot",
      """SELECT * FROM (
        |  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
        |) PIVOT (
        |  sum(l_quantity) FOR l_linestatus IN ('F' AS f_qty, 'O' AS o_qty)
        |)
        |ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f_qty,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // DISTINCT ON — Spark spells it as the row_number()=1 idiom
    Probe.sql2("q_distinct_on",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin),

    // UNION by column name (schema-aligned union)
    Probe.df("q_union_byname",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier
        |) GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
      val a = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("k"), lit(1).as("tag"))
      val b = Tables.load(s, dir, "supplier")
        .select(lit(2).as("tag"), col("s_nationkey").as("k"))  // reversed order
      a.unionByName(b).groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k")
        .select("k", "cnt")
    },

    // EXPLAIN is queryable (plan text engine-specific → rows-only check)
    Probe.noOracle("q_explain") { (s, dir) =>
      Tables.register(s, dir)
      s.sql("EXPLAIN SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
    },

    // EXPLAIN ANALYZE: execute fully, report plan + runtime metric values
    // (rows-only: metric numbers are engine-specific). The SQL-statement
    // form goes through Engine.plan; this probe drives the same renderer.
    Probe.noOracle("q_explain_analyze") { (s, dir) =>
      Tables.register(s, dir)
      import s.implicits._
      org.apache.spark.sql.graftaccess.Internals.explainAnalyze(
          s.sql("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"))
        .toDF("plan_with_metrics")
    },

    // SET statement round-trip (lib.rs:651-653 acknowledges SET) —
    // ORACLE-checked since round 14 (VERDICT r13 stretch #9): the SET
    // values read back through information_schema.df_settings (the
    // DataFusion settings-table surface) and hash-compare against a
    // DuckDB VALUES replay of exactly what was set.
    Probe.df("q_set_conf",
      """SELECT * FROM (VALUES
        |    ('spark.graft.probe.flag', 'on'),
        |    ('spark.graft.probe.level', '7')) AS t(name, value)
        |ORDER BY name""".stripMargin) { (s, dir) =>
      s.sql("SET spark.graft.probe.flag=on")
      s.sql("SET spark.graft.probe.level=7")
      InfoSchema.refresh(s)
      s.sql(InfoSchema.rewrite(
        """SELECT name, value FROM information_schema.df_settings
          |WHERE name IN ('spark.graft.probe.flag',
          |               'spark.graft.probe.level')
          |ORDER BY name""".stripMargin))
    },

    // information_schema introspection (lib.rs:92) — ORACLE-checked
    // (VERDICT r12 #7): DuckDB has information_schema too, so the full
    // per-column inventory of the registered test tables hash-compares
    // after each engine's type names are normalized to one vocabulary
    // (Spark string→varchar, timestamp_ntz→timestamp, array<float>→
    // float[]; DuckDB integer→int, timestamp_ns→timestamp). Catalog/
    // schema columns are engine-specific namespaces and stay projected
    // out; names, order and types are the introspection contract.
    Probe.df("q_information_schema",
      s"""SELECT table_name, column_name,
         |  CAST(ordinal_position AS INT) AS ordinal_position,
         |  CASE lower(data_type)
         |    WHEN 'integer' THEN 'int'
         |    WHEN 'timestamp_ns' THEN 'timestamp'
         |    ELSE lower(data_type) END AS data_type
         |FROM information_schema.columns
         |WHERE table_name IN ($ProbeTables)
         |ORDER BY table_name, ordinal_position""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      InfoSchema.refresh(s)
      s.sql(InfoSchema.rewrite(
        s"""SELECT table_name, column_name,
           |  CAST(ordinal_position AS INT) AS ordinal_position,
           |  CASE data_type
           |    WHEN 'string' THEN 'varchar'
           |    WHEN 'timestamp_ntz' THEN 'timestamp'
           |    WHEN 'array<float>' THEN 'float[]'
           |    ELSE data_type END AS data_type
           |FROM information_schema.columns
           |WHERE table_name IN ($ProbeTables)
           |ORDER BY table_name, ordinal_position""".stripMargin))
    }
  )
}
