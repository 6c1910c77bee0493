package graft.util

/** THE driver/state-side round-9 device: HALF_UP at 9 decimals, the
  * JVM mirror of the engine-side `round(col, 9)` every oracle-exact
  * double in the repo goes through. One definition (round-18 review:
  * three hand-copies across the streaming state functions could drift
  * independently and break a stream ≡ batch pin one copy at a time).
  */
object Round9 {
  def r9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
}
