package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file each under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Plan-level cache: re-loading the same table re-lists files and re-reads
  // footers per query; reusing the DataFrame reuses its InMemoryFileIndex.
  // Assumes the driver-contract invariant that the testdata parquet dirs are
  // immutable (a cached file index would serve stale listings otherwise).
  // Entries of stopped sessions are evicted on the next load so a JVM cycling
  // through sessions doesn't pin dead SparkContexts.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    loaded.keySet.removeIf(k => k._1.sparkContext.isStopped)
    loaded.computeIfAbsent((spark, dir, name), { _ =>
      val df =
        if (name == "events") events(spark, dir)
        else spark.read.parquet(s"$dir/$name.parquet")
      checkSchema(name, df)
      df
    })
  }

  // Expected column -> type family, per table. The driver regenerates the
  // testdata between rounds and has already changed physical types once
  // (events.ts nanos -> micros, round 8, killing 23 queries with an analyzer
  // stack as the only clue). This guard turns the next drift into ONE
  // actionable line naming the table, column, and found-vs-expected types.
  // Families are deliberately loose — queries cast where exactness matters —
  // so only a drift that would actually break query analysis trips it.
  private val integer = Set("ByteType", "ShortType", "IntegerType", "LongType")
  private val floating = Set("FloatType", "DoubleType") ++
    integer // a numeric column narrowed to int still sums/averages fine
  private val text = Set("StringType")
  private val timeish = Set("TimestampType", "TimestampNTZType", "DateType") ++
    integer // epoch-encoded variants remain loadable (events pre-round-8)
  private val floatVec = Set("ArrayType(FloatType,true)", "ArrayType(FloatType,false)",
    "ArrayType(DoubleType,true)", "ArrayType(DoubleType,false)")
  private val expectedCols: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> integer, "r_name" -> text),
    "nation" -> Seq("n_nationkey" -> integer, "n_name" -> text, "n_regionkey" -> integer),
    "customer" -> Seq("c_custkey" -> integer, "c_name" -> text, "c_nationkey" -> integer,
      "c_acctbal" -> floating, "c_mktsegment" -> text),
    "supplier" -> Seq("s_suppkey" -> integer, "s_name" -> text, "s_nationkey" -> integer,
      "s_acctbal" -> floating),
    "part" -> Seq("p_partkey" -> integer, "p_name" -> text, "p_brand" -> text,
      "p_type" -> text, "p_size" -> integer, "p_retailprice" -> floating),
    "orders" -> Seq("o_orderkey" -> integer, "o_custkey" -> integer, "o_orderstatus" -> text,
      "o_totalprice" -> floating, "o_orderdate" -> timeish, "o_orderpriority" -> text),
    "lineitem" -> Seq("l_orderkey" -> integer, "l_partkey" -> integer, "l_suppkey" -> integer,
      "l_linenumber" -> integer, "l_quantity" -> floating, "l_extendedprice" -> floating,
      "l_discount" -> floating, "l_tax" -> floating, "l_returnflag" -> text,
      "l_linestatus" -> text, "l_shipdate" -> timeish),
    "events" -> Seq("event_id" -> integer, "ts" -> timeish, "user_id" -> integer,
      "event_type" -> text, "value" -> floating, "props" -> text),
    "documents" -> Seq("doc_id" -> integer, "text" -> text, "lang" -> text,
      "source" -> text, "n_chars" -> integer),
    "embeddings" -> Seq("vec_id" -> integer, "embedding" -> floatVec, "label" -> integer))

  private def checkSchema(name: String, df: DataFrame): Unit =
    expectedCols.get(name).foreach { cols =>
      val found = df.schema.map(f => f.name -> f.dataType.toString).toMap
      val drift = cols.flatMap { case (col, families) =>
        found.get(col) match {
          case None => Some(s"$col MISSING (have: ${found.keys.toSeq.sorted.mkString(",")})")
          case Some(t) if !families.contains(t) =>
            Some(s"$col is $t, expected one of ${families.toSeq.sorted.mkString("/")}")
          case _ => None
        }
      }
      require(drift.isEmpty,
        s"testdata schema drift in table '$name': ${drift.mkString("; ")} — the " +
          "driver regenerated the testdata with new physical types; update " +
          "Tables.expectedCols and any loader logic (see Tables.events for the pattern)")
    }

  /** Derive an `event_time` TimestampType column from `events.ts`, whatever
    * physical type the generator wrote it as. Current testdata stores
    * TIMESTAMP(MICROS) (Spark reads TIMESTAMP_NTZ; cast is value-identical with
    * the session TZ pinned UTC, matching DuckDB's naive read). Older generators
    * wrote TIMESTAMP(NANOS), which Spark's vectorized reader rejects — that
    * path reads raw Long nanos (legacy conf) and integer-truncates to micros,
    * the exact truncation DuckDB applies (verified: trunc, not round).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw =
      try spark.read.parquet(s"$dir/events.parquet")
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          // Nanos parquet fails schema conversion; re-read raw Long nanos.
          // The legacy conf is session-global — restore its previous value so
          // unrelated nanos-typed reads later in the session still error
          // loudly instead of silently loading as Long (round-9 ADVICE).
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = spark.conf.getOption(key)
          spark.conf.set(key, "true")
          try {
            val df = spark.read.parquet(s"$dir/events.parquet")
            df.schema // force schema resolution while the conf is active
            df
          } finally prev match {
            case Some(v) => spark.conf.set(key, v)
            case None    => spark.conf.unset(key)
          }
      }
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` = integer division; `/` would promote to double and lose
        // precision beyond 2^53 nanos, shifting ~2% of rows by 1µs.
        raw.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("event_time", col("ts").cast(TimestampType))
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
