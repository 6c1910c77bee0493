package graft.tools

import breeze.linalg.DenseMatrix

/** Probe which netlib BLAS backend Breeze resolves to in this container
  * and its dgemm throughput — decides whether enabling
  * `jdk.incubator.vector` (dev.ludovic.netlib VectorBLAS) is worth a
  * JVM flag. Run: `sbt "runMain graft.tools.ProbeBlas"`.
  */
object ProbeBlas {
  def main(args: Array[String]): Unit = {
    println(s"netlib impl: ${dev.ludovic.netlib.blas.BLAS.getInstance().getClass.getName}")
    val n = 1024
    val a = DenseMatrix.fill(n, n)(scala.util.Random.nextDouble())
    val b = DenseMatrix.fill(n, n)(scala.util.Random.nextDouble())
    var c = a * b // warm
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      c = a * b
      val secs = (System.nanoTime() - t0) / 1e9
      val gflops = 2.0 * n * n * n / secs / 1e9
      println(f"dgemm $n%d^3 run$i: $secs%.3f s = $gflops%.1f GFLOPS (checksum ${c(0, 0)}%.3f)")
    }
  }
}
