package graft.tools

import java.time.LocalDateTime
import java.util.SplittableRandom

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

// Top-level case classes (Encoders need them non-nested). Field names and
// types mirror the driver tables byte-for-byte (FIXTURES.md §B).
final case class GRegion(r_regionkey: Int, r_name: String)
final case class GNation(n_nationkey: Int, n_name: String, n_regionkey: Int)
final case class GCustomer(c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)
final case class GSupplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
    s_acctbal: Double)
final case class GPart(p_partkey: Long, p_name: String, p_brand: String,
    p_type: String, p_size: Int, p_retailprice: Double)
final case class GOrder(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)
final case class GLineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
    l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_tax: Double, l_returnflag: String,
    l_linestatus: String, l_shipdate: LocalDateTime)
final case class GEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)
final case class GDocument(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)
final case class GEmbedding(vec_id: Long, embedding: Array[Float], label: Int)

/** Deterministic scale-factor data generator matching the driver testdata's
  * schemas and measured distributions (TESTDATA.md tables, distributions
  * verified against /root/testdata/sf0.1 with DuckDB: value ranges, category
  * frequencies, Poisson(4) lines-per-order with absent empty orders, the
  * documents corpus' 30-word vocab + 5% planted `+" dup"` near-copies whose
  * base-collision rate reproduces the observed exact-dup pairs, unit-norm
  * iid embeddings, monotone event ids). Used to extrapolate sf1+ locally —
  * the driver's own sf0.001–0.1 stay read-only and authoritative.
  *
  * Everything derives from SplittableRandom(mix(tableSalt, id)) so any row
  * is computable independently of partitioning — no sorts, no joins, no
  * driver-side loops; each table is an embarrassingly parallel range map.
  *
  * Caveat: events.ts must be parquet TIMESTAMP(NANOS) like the driver's
  * (Tables.events reads raw nanos via nanosAsLong); Spark cannot write ns,
  * so this main emits ts as int64 nanos and `tools/events_to_ns.py` rewrites
  * the column's logical type.
  */
object GenScaleData {

  private def rng(salt: Long, id: Long): SplittableRandom =
    new SplittableRandom((salt * 0x9e3779b97f4a7c15L) ^ (id * 0xc2b2ae3d27d4eb4fL))

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0
  private def pick[T](r: SplittableRandom, xs: Seq[T]): T = xs(r.nextInt(xs.size))

  private val Day0 = LocalDateTime.of(1995, 1, 1, 0, 0, 0)
  private val OrderDays = 2404 // 1995-01-01 .. 2001-08-01 inclusive
  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val Statuses = Seq("O", "P", "F")
  private val PTypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val Adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val Nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val Langs = Seq("en", "de", "fr", "es", "zh") // en ~41%, rest ~15%
  private val Vocab = Seq("spark", "window", "merge", "table", "column", "vector",
    "stream", "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the", "row",
    "agg", "key", "query", "a", "scan", "batch")

  /** zero-inclusive Poisson(4) — orders drawing 0 simply have no lineitems,
    * reproducing the observed ~1.8% of orderkeys absent from lineitem.
    */
  private def poisson4(r: SplittableRandom): Int = {
    val l = math.exp(-4.0)
    var k = 0
    var p = 1.0
    while ({ p *= r.nextDouble(); p > l }) k += 1
    k
  }

  private def docText(nBase: Long)(id: Long): String = {
    if (id < nBase) {
      val r = rng(70, id)
      val k = 10 + r.nextInt(91)
      Seq.fill(k)(pick(r, Vocab)).mkString(" ")
    } else {
      // planted near-copy: a base doc plus a " dup" suffix token; two
      // plants colliding on the same base are exact duplicates of each
      // other (observed collision rate ≈ plants²/(2·nBase))
      val base = rng(71, id).nextLong(nBase)
      docText(nBase)(base) + " dup"
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("testdata-gen/sf1")
    val sf = args.lift(1).map(_.toDouble).getOrElse(1.0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nCust = (150000 * sf).toLong
    val nSupp = (10000 * sf).toLong
    val nPart = (200000 * sf).toLong
    val nOrders = (1500000 * sf).toLong
    val nEvents = (1000000 * sf).toLong
    val nUsers = (15000 * sf).toLong
    val nDocs = (50000 * sf).toLong
    val nVecs = (20000 * sf).toLong

    // optional arg 3: comma-separated table subset (e.g. "documents,
    // embeddings" for a pair-count-driven scale point — sf10 lineitem is
    // ~60M rows nobody benches)
    val onlyTables = args.lift(2).map(_.split(",").map(_.trim).toSet)
    // optional arg 4: output files per table (default 1, mirroring the
    // driver's single-file layout). At sf30+ a single 175 MB file caps the
    // scan at ~2 input splits (maxPartitionBytes) and serializes every
    // downstream token pass on 2 of 32 cores — a LAYOUT artifact that
    // masquerades as operator super-linearity (t37's first sf30 reading
    // was 15x for this reason alone). Real 100 TB tables are thousands of
    // files; pass 32 here when the point of the run is operator scaling.
    val outFiles = args.lift(3).map(_.toInt).getOrElse(1)
    def write[T](name: String, dsThunk: => Dataset[T]): Unit =
      if (onlyTables.forall(_.contains(name))) writeAll(name, dsThunk)
    def writeAll[T](name: String, ds: Dataset[T]): Unit = {
      val tmp = s"$outDir/_tmp_$name"
      // coalesce can only REDUCE partition count — if the generated
      // dataset has fewer partitions than the requested file count the
      // split-starvation fix would silently not apply (ADVICE r9), so
      // repartition (a real shuffle, fine in a generator) when growing.
      val n = math.max(1, outFiles)
      val shaped =
        if (n == 1 || ds.rdd.getNumPartitions >= n) ds.coalesce(n)
        else ds.repartition(n)
      shaped.write.mode(SaveMode.Overwrite).parquet(tmp)
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .iterator()
      if (outFiles <= 1) {
        val dest = java.nio.file.Paths.get(outDir, s"$name.parquet")
        java.nio.file.Files.move(parts.next(), dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        // multi-file: land as a DIRECTORY named <table>.parquet (Spark and
        // DuckDB both read it transparently)
        val dest = java.nio.file.Paths.get(outDir, s"$name.parquet")
        org.apache.hadoop.fs.FileUtil.fullyDelete(dest.toFile)
        java.nio.file.Files.createDirectories(dest)
        var i = 0
        while (parts.hasNext) {
          java.nio.file.Files.move(parts.next(),
            dest.resolve(f"part-$i%05d.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          i += 1
        }
      }
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp.toString))
      println(s"wrote $outDir/$name.parquet ($outFiles file(s))")
    }

    def ids(n: Long): Dataset[Long] =
      spark.range(0, n, 1, math.max(32, (n / 2000000L).toInt)).as[Long]

    write("region", Seq(
      GRegion(0, "AFRICA"), GRegion(1, "AMERICA"), GRegion(2, "ASIA"),
      GRegion(3, "EUROPE"), GRegion(4, "MIDDLE EAST")).toDS())
    write("nation", (0 until 25).map(i => GNation(i, s"NATION_$i", i % 5)).toDS())

    write("customer", ids(nCust).map { id =>
      val r = rng(10, id)
      GCustomer(id, f"Customer#$id%09d", r.nextInt(25),
        round2(-1000.0 + r.nextDouble() * 11000.0), pick(r, Segments))
    })

    write("supplier", ids(nSupp).map { id =>
      val r = rng(20, id)
      GSupplier(id, f"Supplier#$id%09d", r.nextInt(25),
        round2(-1000.0 + r.nextDouble() * 11000.0))
    })

    write("part", ids(nPart).map { id =>
      val r = rng(30, id)
      GPart(id, s"${pick(r, Adjs)} ${pick(r, Nouns)}", s"Brand#${r.nextInt(25)}",
        pick(r, PTypes), 1 + r.nextInt(50), round2(900.0 + r.nextDouble() * 100.0))
    })

    write("orders", ids(nOrders).map { id =>
      val r = rng(40, id)
      GOrder(id, r.nextLong(nCust), pick(r, Statuses),
        round2(1000.0 + r.nextDouble() * 499000.0),
        Day0.plusDays(r.nextLong(OrderDays)), pick(r, Priorities))
    })

    write("lineitem", ids(nOrders).flatMap { oid =>
      val r = rng(50, oid)
      (1 to poisson4(r)).map { ln =>
        GLineitem(oid, r.nextLong(nPart), r.nextLong(nSupp), ln,
          (1 + r.nextInt(50)).toDouble,
          round2((1 + r.nextInt(50)) * (900.0 + r.nextDouble() * 1200.0)),
          round2(r.nextDouble() * 0.1), round2(r.nextDouble() * 0.08),
          pick(r, Seq("A", "N", "R")), pick(r, Seq("F", "O")),
          Day0.plusDays(r.nextLong(OrderDays) + 1 + r.nextLong(95)))
      }
    })

    // monotone non-decreasing ts (id-indexed slot + intra-slot jitter), so
    // event_id order == time order like the driver data, without a sort
    val nsSpan = 30L * 24 * 3600 * 1000000000L
    val t0ns = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.getEpochSecond * 1000000000L
    write("events", ids(nEvents).map { id =>
      val r = rng(60, id)
      val slot = nsSpan / nEvents
      GEvent(id, t0ns + id * slot + r.nextLong(slot), r.nextLong(nUsers),
        pick(r, EventTypes), round2(-50.0 * math.log(r.nextDouble())),
        s"""{"k": ${r.nextInt(100)}}""")
    })

    val nBase = (nDocs * 0.95).toLong
    write("documents", ids(nDocs).map { id =>
      val r = rng(72, id)
      val text = docText(nBase)(id)
      val langIdx = if (r.nextDouble() < 0.41) 0 else 1 + r.nextInt(4)
      GDocument(id, text, Langs(langIdx), s"src${r.nextInt(20)}", text.length.toLong)
    })

    write("embeddings", ids(nVecs).map { id =>
      val r = rng(80, id)
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      GEmbedding(id, v.map(x => (x / n).toFloat), r.nextInt(10))
    })

    println(s"done: $outDir at sf=$sf")
    spark.stop()
  }
}
