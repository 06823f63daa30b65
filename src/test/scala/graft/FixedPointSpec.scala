package graft

import org.apache.spark.sql.functions._

/** Bit-parity pin for [[graft.functions.RoundScaledLong]] against the SQL
  * spelling it replaces — `cast(round(x * scale, 0) as bigint)` — whose
  * per-element BigDecimal detour was the dominant Lloyd-update cost at
  * 10M × 64. The sweep hits every boundary where a fast rounding could
  * diverge from BigDecimal HALF_UP: exact ±n.5 halves (away-from-zero
  * ties), the largest double below 0.5 (the classic floor(x+0.5) bug —
  * 0.49999999999999994 + 0.5 rounds UP to 1.0 in binary), 1 ± 1 ulp
  * neighbours, the 2^52 integrality edge, cast saturation at ±2^63, and
  * NaN/±Inf pass-throughs.
  */
class FixedPointSpec extends SparkSpec {
  import spark.implicits._

  /** Compare on the domain where the SQL spelling is defined: under ANSI
    * (Spark 4 default) `cast` THROWS past ±2^63 and on NaN, while the
    * kernel saturates/zeroes — the production inputs are |x·scale| ≤ ~2^21,
    * far inside, and the out-of-range kernel contract is pinned separately.
    */
  private def compare(values: Seq[Double], scale: Long): Unit = {
    val inRange = values.filter(x =>
      java.lang.Double.isFinite(x) && math.abs(x) * scale < 9.0e18)
    val rows = inRange.toDF("x").select(col("x"),
      graft.functions.ArrayOps.roundScaledLong(spark, col("x"), scale)
        .as("kernel"),
      expr(s"cast(round(x * ${scale}L, 0) as bigint)").as("sql"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"x=${r.getDouble(0)} scale=$scale: kernel ${r.getLong(1)} != " +
          s"round() ${r.getLong(2)}")
    }
  }

  test("kernel equals cast(round(x*scale,0) as bigint) on adversarial boundaries") {
    val adversarial = Seq(
      0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 1e6 + 0.5, -(1e6 + 0.5),
      0.49999999999999994, -0.49999999999999994, // largest |double| < 0.5
      0.5000000000000001, -0.5000000000000001,
      1.0 - 1.1102230246251565e-16, // 1 − 2⁻⁵³ (largest double < 1)
      4503599627370495.5, -4503599627370495.5, // last representable .5 below 2^52
      4.503599627370496e15, 9.007199254740992e15, // 2^52, 2^53
      1.0 / 3.0, -1.0 / 3.0, 0.1, -0.1, 123.456, -123.456)
    compare(adversarial, 1L)
    // at the production scale the boundary cases shift — sweep values
    // whose PRODUCT with 2^20 lands on the same boundaries
    val s = 1L << 20
    compare(adversarial.map(x => x / s) ++ adversarial, s)
  }

  test("kernel equals round() on seeded random sweeps at both scales") {
    val rnd = new scala.util.Random(20260815L)
    val randoms = (0 until 20000).map { _ =>
      rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 2.0 - 1.0 // the embedding range
        case 1 => (rnd.nextInt(2000001) - 1000000) / 1000.0 // fixture grid
        case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case d if java.lang.Double.isFinite(d) && math.abs(d) < 1e15 => d
          case _ => rnd.nextDouble()
        }
        case _ => (rnd.nextInt(2001) - 1000) + 0.5 // exact halves
      }
    }
    compare(randoms, 1L)
    compare(randoms, 1L << 20)
  }

  private def compare6(values: Seq[Double]): Unit = {
    val rows = values.filter(java.lang.Double.isFinite)
      .toDF("x").select(col("x"),
        graft.functions.ArrayOps.round6(spark, col("x")).as("kernel"),
        round(col("x"), 6).as("sql"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"x=${r.getDouble(0)}: round6 ${r.getDouble(1)} != round(,6) ${r.getDouble(2)}")
    }
  }

  test("round6 equals round(x, 6) on decimal-midpoint neighbourhoods and randoms") {
    val rnd = new scala.util.Random(99L)
    // exact decimal midpoints (n + 0.5)·10⁻⁶ and their ulp neighbours —
    // the band where the kernel must fall back to BigDecimal to keep
    // HALF_UP's away-from-zero tie semantics
    val mids = (0 until 2000).flatMap { _ =>
      val n = rnd.nextInt(4000001) - 2000000
      val m = (n + 0.5) / 1e6
      Seq(m, -m, math.nextUp(m), math.nextDown(m),
        math.nextUp(-m), math.nextDown(-m))
    }
    val randoms = (0 until 20000).map { _ =>
      rnd.nextInt(3) match {
        case 0 => rnd.nextDouble() * 2.0 - 1.0 // the cosine range
        case 1 => (rnd.nextDouble() - 0.5) * 2e7 // past the 1e6 scale
        case _ => (rnd.nextInt(2000001) - 1000000) / 1e6 // exact 6-dp grid
      }
    }
    compare6(mids ++ randoms ++ Seq(0.0, -0.0, 1.0, -1.0, 0.4999995,
      -0.4999995, 1e-7, -1e-7, 4.5e15, -4.5e15, 9e15, 1e300, -1e300))
    // non-finite pass-through, as Spark's round leaves them
    val k = graft.functions.Round6
    assert(k.round(Double.NaN).isNaN)
    assert(k.round(Double.PositiveInfinity) == Double.PositiveInfinity)
    assert(k.round(Double.NegativeInfinity) == Double.NegativeInfinity)
  }

  test("out-of-domain kernel contract: NaN zeroes, overflow saturates") {
    val k = graft.functions.RoundScaledLong
    assert(k.run(Double.NaN, 1L) == 0L)
    assert(k.run(Double.PositiveInfinity, 1L) == Long.MaxValue)
    assert(k.run(Double.NegativeInfinity, 1L) == Long.MinValue)
    assert(k.run(1.7976931348623157e308, 1L) == Long.MaxValue)
    assert(k.run(-1.7976931348623157e308, 1L << 20) == Long.MinValue)
  }
}
