package graft.tools
/** Measures this host's JVM thread-scaling ceiling on a tokenize-like
  * allocation-heavy workload — calibration for the N→4N pair choice.
  */
object ThreadScale {
  def work(iters: Int): Long = {
    var acc = 0L
    val text = "object Foo { def bar(x: Int): Int = x * 31 + baz(x) } // comment with words " * 40
    var i = 0
    while (i < iters) {
      val toks = graft.tokenize.Tokenizer.tokenize(text)
      val m = scala.collection.mutable.HashMap.empty[String, Int]
      toks.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
      acc += m.size
      i += 1
    }
    acc
  }
  def main(args: Array[String]): Unit = {
    work(20000) // warmup JIT
    Seq(1, 2, 4, 8, 16, 4, 2, 1).foreach { n =>
      val iters = 120000
      val t0 = System.nanoTime()
      val threads = (1 to n).map(_ => new Thread(() => work(iters)))
      threads.foreach(_.start()); threads.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"threads=$n%2d wall=$dt%6.2fs per-thread-throughput=${iters/dt}%8.1f it/s")
    }
  }
}
