package graft.schema

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logical-schema conformance for every table the engine reads.
  *
  * Round 8's lesson, generalized: the engine reads data it does not
  * generate, and the writer — not the engine — picks the physical
  * encoding. One regeneration of the test fixtures moved `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros and zeroed 45 gates
  * because ONE reader hard-coded one encoding. The same drift class
  * can hit any column of any table: ids written int32 vs int64,
  * embeddings written float64 vs float32, dates written DATE vs
  * TIMESTAMP. At 100 TB the inputs come from dozens of upstream
  * writers (Spark, parquet-mr, pyarrow, DuckDB, Rust arrow) that all
  * make different defaults, so "the file's type equals my type" is
  * never an invariant — it's an accident.
  *
  * This object pins the engine's LOGICAL contract per table
  * ([[contracts]]) and conforms whatever physically arrives:
  *
  *   - identical physical type → untouched (and a fully-identical
  *     schema returns the SAME DataFrame — zero plan change on the
  *     no-drift fast path, so conformance costs nothing today);
  *   - value-preserving drift → an in-plan cast (integral widening,
  *     float→double, decimal→double, DATE/NTZ/TZ→timestamp under the
  *     pinned-UTC session, legacy long-nanos→timestamp);
  *   - value-RISKING drift → a guarded cast that raises in-plan on
  *     the first actually-lossy row (integral narrowing overflow), so
  *     a file of small-valued int64s conforms to an int32 contract
  *     but a genuinely overflowing value fails loudly instead of
  *     wrapping;
  *   - semantic drift (string vs numeric, timestamp→date, …) →
  *     refused at PLAN time with the table.column named. Silent
  *     coercion across semantic classes is how wrong-but-plausible
  *     answers happen (r8's 1970 windows) — the engine never does it.
  *
  * Extra physical columns are dropped (the contract IS the projection
  * — column pruning still reaches the scan); missing ones refuse at
  * plan time.
  */
object Conform {

  /** Engine-logical schemas for the driver's test tables (TESTDATA.md).
    * These are the types every query and oracle is written against;
    * the physical file may drift within the conformance rules above.
    */
  val contracts: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    // events.ts is TimestampType (instant): the whole query surface
    // windows/sessions on it as an instant, and Tables.normalizeTs
    // established UTC-instant semantics across all three encodings the
    // harness has shipped. orders/lineitem dates stay NTZ — they are
    // civil dates and every oracle compares them naively.
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Structural type equality ignoring nullability/metadata — the
    * public `DataType.sameType` is private[sql], so the small
    * recursion lives here.
    */
  private[graft] def sameType(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (ArrayType(ea, _), ArrayType(eb, _)) => sameType(ea, eb)
      case (MapType(ka, va, _), MapType(kb, vb, _)) =>
        sameType(ka, kb) && sameType(va, vb)
      case (StructType(fa), StructType(fb)) =>
        fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
          x.name == y.name && sameType(x.dataType, y.dataType)
        }
      case _ => a == b
    }

  private def integralRank(t: DataType): Option[Int] = t match {
    case ByteType => Some(1); case ShortType => Some(2)
    case IntegerType => Some(3); case LongType => Some(4)
    case _ => None
  }

  /** Is `from → to` a plain value-preserving cast (no guard needed)? */
  private def pureCast(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if integralRank(f).isDefined && integralRank(t).isDefined =>
        integralRank(f).get <= integralRank(t).get // widening only
      case (FloatType, DoubleType) => true
      // double→float: the logical contract says float32 (embeddings);
      // an upstream writer that stored the same values wide conforms
      // back down. Documented precision trade, same class as the
      // reference's float32 output contract.
      case (DoubleType, FloatType) => true
      case (_: DecimalType, DoubleType) => true
      case (f, DoubleType) if integralRank(f).isDefined => true
      case (TimestampNTZType, TimestampType) => true // UTC session pinned
      case (TimestampType, TimestampNTZType) => true
      case (DateType, TimestampType) => true
      case (DateType, TimestampNTZType) => true
      case _ => false
    }

  /** Convert one top-level column from its physical type to the
    * contract type, or refuse loudly at plan time. `name` must be the
    * column's top-level name (the legacy long-nanos branch builds a
    * `div` over it by name).
    */
  private[graft] def convert(name: String, from: DataType, to: DataType,
                             ctx: String): Column = {
    val c = col(name)
    (from, to) match {
      case (f, t) if sameType(f, t) => c
      case (f, t) if pureCast(f, t) => c.cast(t)
      // the one long-encoded timestamp the harness has shipped is
      // TIMESTAMP(NANOS) surfaced as long via the nanosAsLong shim —
      // integer `div` because ~1.7e18 exceeds double's exact range
      case (LongType, TimestampType) =>
        timestamp_micros(expr(s"`$name` div 1000"))
      case (LongType, TimestampNTZType) =>
        timestamp_micros(expr(s"`$name` div 1000")).cast(TimestampNTZType)
      // integral narrowing: conform, but raise in-plan on the first
      // value the narrow type cannot hold — never wrap silently.
      // try_cast (null on overflow in BOTH ansi modes) is the probe:
      // a plain cast would throw Spark's generic CAST_OVERFLOW under
      // ansi (losing the table.column context) and silently wrap with
      // ansi off.
      case (f, t) if integralRank(f).isDefined &&
          integralRank(t).isDefined =>
        val tried = expr(s"try_cast(`$name` AS ${t.sql})")
        when(c.isNotNull && tried.isNull,
          raise_error(concat(
            lit(s"conform: $ctx value "), c.cast(StringType),
            lit(s" overflows ${t.simpleString}"))).cast(t))
          .otherwise(tried)
      // element-wise array conformance for pure-cast element pairs
      // (one codegen'd cast, no lambda)
      case (ArrayType(ef, _), at @ ArrayType(et, _))
          if sameType(ef, et) || pureCast(ef, et) =>
        c.cast(at)
      case (f, t) => throw new IllegalStateException(
        s"conform: $ctx arrived as ${f.simpleString} but the contract " +
          s"is ${t.simpleString} - no value-preserving conversion " +
          "exists; refusing to coerce across semantic classes")
    }
  }

  /** Conform `df` to `contract`. No-drift fast path: when the physical
    * schema already equals the contract (names, order, types), the
    * input DataFrame is returned untouched — identical plan, zero
    * cost. Otherwise a single projection of per-column conversions
    * (extra columns dropped, missing ones refused).
    */
  def conform(df: DataFrame, contract: StructType, table: String):
      DataFrame = {
    val have = df.schema
    val identical = have.length == contract.length &&
      have.fields.zip(contract.fields).forall { case (h, c) =>
        h.name == c.name && sameType(h.dataType, c.dataType)
      }
    if (identical) df
    else {
      val byName = have.fields.map(f => f.name -> f).toMap
      val cols = contract.fields.map { f =>
        val phys = byName.getOrElse(f.name, throw new IllegalStateException(
          s"conform: $table is missing contract column ${f.name} " +
            s"(file has: ${have.fieldNames.mkString(", ")})"))
        convert(f.name, phys.dataType, f.dataType,
          s"$table.${f.name}").as(f.name)
      }
      df.select(cols.toSeq: _*)
    }
  }

  /** The read schema a STREAMING file source must declare for a file
    * to hand back its actual physical values: the file's footer types,
    * projected to the contract's columns. Declaring the contract's
    * logical types instead is the r8 failure mode — the source
    * silently satisfies a wrong declaration with reinterpreted values
    * (micros handed to a long declaration → 1970 windows). Probe once
    * per path (memoized; schema inference reads footers only, but at
    * production file counts the listing isn't free).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def physicalReadSchema(spark: SparkSession, path: String,
                         contract: StructType, table: String): StructType = {
    // legacy-nanos shim first, as Tables.tsEncoding does: a
    // TIMESTAMP(NANOS) footer must infer as long, not crash
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schemaCache.computeIfAbsent(path, { _ =>
      val have = spark.read.parquet(path).schema
      val byName = have.fields.map(f => f.name -> f).toMap
      StructType(contract.fields.map { f =>
        byName.getOrElse(f.name, throw new IllegalStateException(
          s"conform: $table at $path is missing contract column " +
            s"${f.name} (file has: ${have.fieldNames.mkString(", ")})"))
      }.toSeq)
    })
  }
}
