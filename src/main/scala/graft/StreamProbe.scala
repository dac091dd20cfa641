package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming._

/** Dev main: MEASURE the streaming side's cost curves (round-8 advice:
  * ScaleProbe covers batch only — the 35 D components had state-plateau
  * and batch-equivalence pins but no measured per-micro-batch wall vs
  * batch-VOLUME curve).
  *
  * For the heaviest stateful families (D6 SCD2, D10 pack, D17 stratified
  * bottom-k sample, D22 shape drift, D26 semantic drift), feed
  * [[BaseRows]]·k-row micro-batches at k = 1/2/4/8 through the same
  * `flatMapGroupsWithState` queries the specs pin, over a FIXED key
  * universe (users/sources/strata) — per-key batch volume DEEPENS with k,
  * the hard direction for per-group work, while state stays at its
  * documented plateau. Wall per micro-batch (min of 2 at each k, rows
  * generated off the clock) must grow near-linearly:
  * t(8×) ≤ 1.5·8·max(t(1×), [[FloorSec]]) — the ScaleProbe gate applied
  * per micro-batch; the floor absorbs the fixed per-batch state-store
  * commit cost that dominates small batches.
  *
  * Usage: `sbt "runMain graft.StreamProbe"`; set SPARK_GRAFT_STREAM_OUT
  * to also write the table (SCALING_r09.md carries it).
  */
object StreamProbe {

  val BaseRows: Int = 50000
  val Scales: Seq[Int] = Seq(1, 2, 4, 8)
  val MaxRatio: Double = 1.5 * Scales.last / Scales.head
  val FloorSec: Double = 0.3

  private case class Curve(name: String, secs: Seq[Double]) {
    def ratio: Double = secs.last / math.max(secs.head, FloorSec)
    def ok: Boolean = ratio <= MaxRatio
  }

  /** Drive one component: warmup batch, then min-of-2 timed batches per
    * scale. Batch rows are generated BEFORE the clock starts; batch
    * indices keep every row fresh so state revisions advance normally. */
  private def drive[T](name: String, in: MemoryStream[T], q: StreamingQuery,
      mk: (Int, Int) => Seq[T]): Curve = {
    var batch = 0
    def runOne(k: Int): Double = {
      batch += 1
      val rows = mk(k, batch)
      val t0 = System.nanoTime()
      in.addData(rows: _*)
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    try {
      runOne(1) // warmup: codegen + state-store open
      Curve(name, Scales.map(k => math.min(runOne(k), runOne(k))))
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sp: SparkSession = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    sp.sparkContext.setLogLevel("WARN")
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    def ckpt() = java.nio.file.Files
      .createTempDirectory("graft-streamprobe-").toString
    def start[T](ds: org.apache.spark.sql.Dataset[T],
        mode: String): StreamingQuery =
      ds.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt()).start()

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

    // D6: 1000 fixed users, per-user event volume deepens with k; event
    // time advances across batches (in-order per user within a batch)
    val in6 = MemoryStream[ChangeEvent]
    val c6 = drive("D6 scd2", in6,
      start(Scd2Stream.scd2(Scd2Stream.withWatermark(in6.toDS())), "append"),
      (k, b) => (0 until BaseRows * k).map { i =>
        ChangeEvent(i % 1000L, new Timestamp(t0 + b * 100000000L + i * 10L),
          b * 10000000L + i, (i % 97).toDouble)
      })

    // D10: 10 fixed sources, packing offsets carry across batches
    val in10 = MemoryStream[PackDoc]
    val c10 = drive("D10 pack", in10,
      start(PackStream.pack(in10.toDS(), budget = 512L), "append"),
      (k, b) => (0 until BaseRows * k).map { i =>
        PackDoc("s" + i % 10, b * 10000000L + i, 1L + i % 50)
      })

    // D17: 60 fixed strata (20 sources x 3 langs), bottom-k per stratum
    val langs = Seq("en", "es", "de")
    val in17 = MemoryStream[DocHash]
    val c17 = drive("D17 sample", in17,
      start(SampleStream.rows(in17.toDS(), k = 100), "update"),
      (k, b) => (0 until BaseRows * k).map { i =>
        DocHash("s" + i % 20, langs(i % 3), b * 10000000L + i,
          (b * 10000000L + i) * 2654435761L % 1000003L)
      })

    // D22: 10 fixed sources vs a frozen shape baseline
    val base22 = (0 until 10).map(s => "s" + s -> BaseHist(1000L,
      Map(0 -> 400L, 1 -> 400L, 2 -> 200L),
      Map("en" -> 500L, "es" -> 300L, "de" -> 200L))).toMap
    val in22 = MemoryStream[DriftDoc]
    val c22 = drive("D22 drift", in22,
      start(DriftStream.monitor(in22.toDS(), base22), "append"),
      (k, b) => (0 until BaseRows * k).map { i =>
        DriftDoc("s" + i % 10, langs(i % 3), (i.toLong * 7 + b) % 400)
      })

    // D26: 10 fixed sources vs a frozen cluster-mix baseline
    val base26 = (0 until 10).map(s => "s" + s -> SemBase(1000L,
      (0L until 8L).map(c => c -> 125L).toMap)).toMap
    val in26 = MemoryStream[SemDoc]
    val c26 = drive("D26 semantic drift", in26,
      start(SemanticDriftStream.monitor(in26.toDS(), base26), "append"),
      (k, b) => (0 until BaseRows * k).map { i =>
        SemDoc("s" + i % 10, (i + b) % 8L)
      })

    val curves = Seq(c6, c10, c17, c22, c26)
    val header = f"| ${"component"}%-18s |" +
      Scales.map(k => f" ${s"${k}x (${BaseRows * k / 1000}k)"}%10s |").mkString +
      " 8x/1x | gate |"
    val sep = "|" + "-" * 20 + "|" + ("-" * 12 + "|") * Scales.size +
      "-------|------|"
    val rows = curves.map { c =>
      f"| ${c.name}%-18s |" + c.secs.map(v => f" $v%9.2fs |").mkString +
        f" ${c.ratio}%4.1fx | ${if (c.ok) "PASS" else "FAIL"} |"
    }
    (Seq(header, sep) ++ rows).foreach(println)
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "")
    if (out.nonEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        (Seq(header, sep) ++ rows).mkString("", "\n", "\n"))
    sp.stop()
    val failed = curves.filterNot(_.ok).map(_.name)
    if (failed.nonEmpty) {
      System.err.println(
        s"[streamprobe] superlinear micro-batch growth: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
