package graft.tools

/** Dev-only host-contention probe (the BASELINE.md "spin test", now
  * reproducible): run a fixed CPU-bound workload solo and then N-way
  * concurrent, and report the per-task throughput degradation ratio.
  * A healthy dedicated N-core box stays ~flat; sibling/neighbor
  * contention (invisible to steal_pct) shows up directly. Run BEFORE
  * trusting any bench wall/CPU comparison across sessions.
  *
  * Usage: tools/run_java.sh graft.tools.ProfileSpin [threads=32]
  */
object ProfileSpin {
  private def work(): Double = {
    val t0 = System.nanoTime
    var x = 0L
    var i = 0
    while (i < 300000000) { x += i.toLong * i; i += 1 }
    if (x == 42L) print("") // keep the loop observable
    (System.nanoTime - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(32)
    val solo = (1 to 3).map(_ => work()).min
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val futures = (1 to n).map(_ =>
      pool.submit(new java.util.concurrent.Callable[Double] {
        def call(): Double = work()
      }))
    val ts = futures.map(_.get())
    pool.shutdown()
    val avg = ts.sum / ts.size
    println(f"SPIN solo=${solo}%.2fs ${n}%d-way avg=${avg}%.2fs max=${ts.max}%.2fs ratio=${avg / solo}%.2fx")
  }
}
