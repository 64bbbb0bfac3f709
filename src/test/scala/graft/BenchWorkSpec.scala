package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's work-metrics listener (Bench.WorkListener): the
  * per-query cpu/input/shuffle numbers in BENCH_FULL.json are what make
  * wall-clock anomalies adjudicable (host storm vs real regression), so
  * the listener itself must demonstrably measure — a silently-zero
  * metric would read as "no work" and mislead the adjudication. */
class BenchWorkSpec extends AnyFunSuite with SparkTestBase {

  test("WorkListener captures cpu, input and shuffle volume for a real job") {
    val l = new Bench.WorkListener
    spark.sparkContext.addSparkListener(l)
    try {
      l.drain(); l.reset()
      val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag").count()
      df.write.format("noop").mode("overwrite").save()
      l.drain()
      val w = l.snapshot
      assert(w.tasks > 0, s"no tasks observed: $w")
      assert(w.cpuS > 0, s"zero cpu: $w")
      assert(w.inputRows > 0 && w.inputMb > 0, s"no input observed: $w")
      assert(w.shWriteMb > 0 && w.shReadMb > 0,
        s"groupBy must show shuffle volume: $w")
      // reset zeroes every counter — a stale value would attribute one
      // query's work to the next
      l.drain(); l.reset()
      val z = l.snapshot
      assert(z.tasks == 0 && z.cpuS == 0 && z.inputRows == 0 &&
        z.shReadMb == 0 && z.peakMemMb == 0, s"reset left state: $z")
      // TSV round-trip: the child→parent handoff must not lose fields
      val rt = Bench.Work.fromTsv(w.tsv.split("\t"))
      assert(rt.inputRows == w.inputRows && rt.tasks == w.tasks)
      assert(math.abs(rt.cpuS - w.cpuS) < 0.002)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("the compact stdout headline stays inside the driver's 4 KB tail " +
    "as the battery grows") {
    // the driver keeps only the last 4 KB of bench output; the compact
    // line carries one `"<name>":<sec>` entry per battery query plus
    // fixed overhead, and sbt's epilogue (~100 B) follows it. Model the
    // worst case (8 bytes for a 3-decimal seconds value ≥ 100 s) and
    // fail BEFORE a battery addition silently pushes the line past the
    // window, which would regress the parsed-artifact fix.
    val names = SparkEntry.queries.keys.toSeq
    val perQuery = names.map(_.length + 12).sum // "name":123.456, per entry
    val overhead = 600 // metric/value/unit/sf/runs/agg/jvm/full_report
    val epilogue = 200 // sbt [success] line + newline slack
    assert(perQuery + overhead + epilogue < 4096,
      s"compact bench line would be ~${perQuery + overhead} B for " +
        s"${names.size} queries — shorten names or split the line " +
        "before the driver's 4 KB tail truncates it again")
  }

  test("host-contention snapshot reads real counters and deltas to sane JSON") {
    // the "host" section of BENCH_FULL.json is the second half of the
    // storm-vs-regression adjudication (work metrics being the first);
    // a silently-zero or malformed section would read as "calm host"
    val a = Bench.hostSnap()
    // burn a little cpu so the tick counters visibly advance
    var acc = 0L
    val until = System.nanoTime() + 300000000L
    while (System.nanoTime() < until) acc += 1
    val b = Bench.hostSnap()
    assert(b.totalTicks > a.totalTicks, s"cpu ticks did not advance: $a -> $b")
    assert(b.wallNs > a.wallNs)
    assert(a.load1 >= 0, s"loadavg unreadable: $a")
    val json = Bench.hostDeltaJson(a, b)
    // structurally valid JSON with every expected key, percentages bounded
    for (k <- Seq("wall_s", "steal_pct", "iowait_pct",
        "cpu_psi_some_pct", "io_psi_some_pct", "load1_end"))
      assert(json.contains("\"" + k + "\":"), s"missing $k in $json")
    val pcts = """"(\w+_pct)":(-?[0-9.]+)""".r
      .findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toDouble).toSeq
    pcts.foreach { case (k, v) =>
      assert(v >= 0 && v <= 100, s"$k out of range in $json")
    }
    assert(acc > 0) // keep the busy-loop observable
  }
}
