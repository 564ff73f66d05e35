package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Tail-robustness goldens for the closed-form CDFs (pure JVM — no
  * Spark session needed; the Catalyst expressions call exactly these
  * statics from generated code).
  *
  * Reference values computed with mpmath at 60 significant digits:
  *   t:    I_{df/(df+t²)}(df/2, 1/2)
  *   F:    I_{d2/(d2+d1·f)}(d2/2, d1/2)      (direct upper tail)
  *   chi²: Q(df/2, x/2)
  *   norm: erfc(z/√2)
  * The closed-form identities can lose precision exactly where
  * volcano/ANOVA p-values get interesting (|t| ≫ 1, F ≫ 1, deep
  * gamma tails); these goldens pin the achieved relative error. Where
  * the true value is below ~4.9e-324 the double answer MUST underflow
  * to exactly 0.0 (never NaN or a wrong sign) — asserted separately.
  */
class DistMathTailSpec extends AnyFunSuite {

  /** Relative error bound. 1e-12 is the spec'd target; individual
    * cases state a looser DOCUMENTED bound where commons-math3's
    * continued fraction genuinely delivers less (none currently do). */
  private def assertRel(actual: Double, expected: Double, relTol: Double = 1e-12): Unit = {
    assert(!actual.isNaN, s"NaN for expected $expected")
    val rel = math.abs(actual - expected) / math.abs(expected)
    assert(rel <= relTol, s"got $actual, want $expected (rel err $rel > $relTol)")
  }

  test("t two-sided p: extreme |t| and minimal df (n=2 → df=1)") {
    val golden = Seq(
      (50.0, 1.0, 0.012730698201945593),
      (200.0, 1.0, 0.0031830723364119383),
      (10000.0, 1.0, 6.3661977024551545e-5),
      (50.0, 2.0, 0.00039976015988808058),
      (75.5, 2.0, 0.00017538475164478049),
      (60.0, 30.0, 8.3113096135322487e-33),
      (12.3, 5.0, 6.2878683034851574e-5),
      (300.0, 2.0, 1.1110925929355215e-5))
    for ((t, df, p) <- golden) assertRel(DistMath.tPTwoSided(t, df), p)
  }

  test("F upper p: df1=1 and far tails — direct complement, no 1-CDF cancellation") {
    val golden = Seq(
      // the 2.45e-16 case is the cancellation smoking gun: the old
      // `1.0 - I_x` form had ~1e-16 ABSOLUTE error, i.e. zero correct
      // digits here; the direct form is fully accurate
      (10000.0, 1.0, 10.0, 2.4496895554198299e-16),
      (50000.0, 1.0, 2.0, 1.9999400019999300e-5),
      (1000000.0, 1.0, 1.0, 0.00063661956016111788),
      (400.0, 2.0, 50.0, 1.7329138212252766e-31),
      (80.0, 5.0, 3.0, 0.0021661454032805363))
    for ((f, d1, d2, p) <- golden) assertRel(DistMath.fPUpper(f, d1, d2), p)
  }

  test("chi-square upper p: x > 1e4, df > 100, and the representable deep tail") {
    val golden = Seq(
      (500.0, 120.0, 7.5688632661503653e-48),
      (150.0, 100.0, 0.00090393204235400909))
    for ((x, df, p) <- golden) assertRel(DistMath.chiSqPUpper(x, df), p)
  }

  test("underflowing tails come back as exact 0.0, never NaN") {
    // true values ~1e-2170 .. 1e-216219 — far below the 4.9e-324
    // double floor; the implementation must degrade to +0.0
    val zero = Seq(
      DistMath.chiSqPUpper(10000.0, 3.0),
      DistMath.chiSqPUpper(12000.0, 100.0),
      DistMath.chiSqPUpper(20000.0, 150.0),
      DistMath.chiSqPUpper(1000000.0, 500.0))
    zero.foreach(p => assert(p == 0.0, s"expected exact underflow, got $p"))
  }

  test("normal two-sided p: erfc into the subnormal range") {
    val golden = Seq(
      (10.0, 1.5239706048321052e-23),
      (20.0, 5.5072482372124674e-89),
      (30.0, 9.8134278542963741e-198))
    for ((z, p) <- golden) assertRel(DistMath.normPTwoSided(z), p)
    // z=37/38: true values 1.1e-299 / 5.8e-316 brush the subnormal
    // floor; commons-math3 must return either a sane approximation or
    // exact underflow — never NaN, never > 1e-290
    for (z <- Seq(37.0, 38.0)) {
      val p = DistMath.normPTwoSided(z)
      assert(!p.isNaN && p >= 0.0 && p < 1e-290, s"z=$z gave $p")
    }
  }
}
