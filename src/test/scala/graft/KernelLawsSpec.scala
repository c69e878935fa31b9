package graft

import graft.functions.VectorKernels
import graft.spectral.{LapEdge, LocalLaplacian}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the driver-side kernels — no SparkSession,
  * pure math invariants over scalacheck-generated inputs (driven with
  * a deterministic seeded sampler; the scalatest-scalacheck bridge is
  * not in the offline dependency cache).
  */
class KernelLawsSpec extends AnyFunSuite {

  private def forSamples[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forSamples(ga.flatMap(a => gb.map(b => (a, b))))(f.tupled)

  private val vecGen: Gen[Array[Double]] =
    for {
      n <- Gen.choose(1, 32)
      xs <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    } yield xs.toArray

  private def pairGen: Gen[(Array[Double], Array[Double])] =
    for {
      n <- Gen.choose(1, 32)
      a <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
      b <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    } yield (a.toArray, b.toArray)

  test("cosine: symmetric, bounded, and exactly 1 for any nonzero self-pair") {
    forSamples(pairGen) { case (a, b) =>
      val ab = VectorKernels.cosine(a, b)
      val ba = VectorKernels.cosine(b, a)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12)
    }
    forSamples(vecGen) { a =>
      if (VectorKernels.normSq(a) > 1e-9)
        assert(math.abs(VectorKernels.cosine(a, a) - 1.0) < 1e-9)
    }
  }

  test("cosine: invariant under positive scaling, negated under flip") {
    forSamples2(pairGen, Gen.choose(0.1, 100.0)) { case ((a, b), s) =>
      if (VectorKernels.normSq(a) > 1e-9 && VectorKernels.normSq(b) > 1e-9) {
        val c = VectorKernels.cosine(a, b)
        assert(math.abs(VectorKernels.cosine(a.map(_ * s), b) - c) < 1e-9)
        assert(math.abs(VectorKernels.cosine(a.map(-_), b) + c) < 1e-9)
      }
    }
  }

  test("l2normalize composed with cosine equals dot product") {
    forSamples(pairGen) { case (a, b) =>
      if (VectorKernels.normSq(a) > 1e-9 && VectorKernels.normSq(b) > 1e-9) {
        val na = VectorKernels.l2normalize(a)
        val nb = VectorKernels.l2normalize(b)
        assert(math.abs(VectorKernels.dot(na, nb) - VectorKernels.cosine(a, b)) < 1e-9)
      }
    }
  }

  private val lapGen: Gen[(LocalLaplacian, Array[Double])] =
    for {
      dim <- Gen.choose(2, 12)
      nEdges <- Gen.choose(1, 20)
      edges <- Gen.listOfN(nEdges, for {
        f <- Gen.choose(0, dim - 2)
        g <- Gen.choose(f + 1, dim - 1)
        w <- Gen.choose(0.01, 5.0)
      } yield LapEdge(f, g, w))
      x <- Gen.listOfN(dim, Gen.choose(-5.0, 5.0))
    } yield (LocalLaplacian(dim, edges.distinct.toArray), x.toArray)

  test("Dirichlet energy: non-negative, zero on constants, quadratic in scale") {
    forSamples(lapGen) { case (lap, x) =>
      val e = lap.dirichlet(x)
      assert(e >= 0.0)
      assert(lap.dirichlet(Array.fill(lap.dim)(3.7)) < 1e-18)
      val e2 = lap.dirichlet(x.map(_ * 2.0))
      assert(math.abs(e2 - 4.0 * e) <= 1e-9 * math.max(1.0, e), s"e=$e e2=$e2")
    }
  }

  test("Gini concentration is in [0,1] and 1 for a single dominant edge") {
    forSamples(lapGen) { case (lap, x) =>
      val g = lap.dirichletGini(x)
      assert(g >= 0.0 && g <= 1.0)
    }
    // exactly one edge carrying energy -> share 1 -> sum of squares 1
    val one = LocalLaplacian(3, Array(LapEdge(0, 1, 2.0)))
    assert(math.abs(one.dirichletGini(Array(1.0, 0.0, 5.0)) - 1.0) < 1e-12)
  }

  test("synth lambda is in [0, 1] for any tau > 0") {
    forSamples2(lapGen, Gen.choose(1e-8, 100.0)) { case ((lap, x), tau) =>
      val l = lap.synth(x, tau)
      assert(l >= 0.0 && l <= 1.0, s"lambda $l out of [0,1]")
    }
  }

  test("t p-value: in (0,1], decreasing in |t|, increasing toward df-limit") {
    import graft.metrics.RankingMetrics.twoSidedTPValue
    forSamples2(Gen.choose(0.01, 20.0), Gen.choose(1.0, 200.0)) { (t, df) =>
      val p = twoSidedTPValue(t, df)
      assert(p > 0.0 && p <= 1.0)
      assert(twoSidedTPValue(t * 2.0, df) <= p + 1e-12)
    }
  }

  test("scalar SQ8: err is a SOUND bound on the cosine error against any vector") {
    // the embed gate's compact-probe soundness law (VERDICT r13 #3):
    // a code-space pruning pass at threshold T - err can never drop a
    // pair whose exact cosine reaches T
    import graft.functions.Sq8Kernels
    forSamples(pairGen) { case (x, v) =>
      val (codes, lo, hi, err) = Sq8Kernels.encodeScalar(x)
      assert(codes.length == x.length && lo <= hi && err >= 0.0)
      val exact = VectorKernels.cosine(v, x)
      val approx = Sq8Kernels.cosineDeqScalar(codes, v, lo, hi)
      assert(math.abs(exact - approx) <= err + 1e-12,
        s"exact=$exact approx=$approx err=$err lo=$lo hi=$hi")
    }
    // constant vector: zero quantization range decodes exactly (err 0)
    val const = Array(3.5, 3.5, 3.5)
    val (c0, lo0, hi0, e0) = Sq8Kernels.encodeScalar(const)
    assert(e0 == 0.0 && lo0 == 3.5 && hi0 == 3.5)
    val probe = Array(1.0, 2.0, 3.0)
    assert(math.abs(Sq8Kernels.cosineDeqScalar(c0, probe, lo0, hi0) -
      VectorKernels.cosine(probe, const)) < 1e-12)
    // zero vector: cosine-0-everywhere convention shared with cosine()
    val (cz, loz, hiz, ez) = Sq8Kernels.encodeScalar(Array(0.0, 0.0))
    assert(ez == 0.0 &&
      Sq8Kernels.cosineDeqScalar(cz, Array(1.0, 1.0), loz, hiz) == 0.0)
    // empty vector is well-defined
    assert(Sq8Kernels.encodeScalar(Array.empty[Double])._4 == 0.0)
  }
}
