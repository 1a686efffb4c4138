package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Base58, CodecOps}

/** Property-based checks for the byte-level kernels: these run without a
  * SparkSession (the expressions delegate to these same static helpers
  * from generated code, so the properties transfer). */
class CodecPropsSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("le bytes/long round-trip for all longs") {
    check(Prop.forAll { (v: Long) =>
      CodecOps.leLong(CodecOps.leBytes(v, 8), 0) == v
    })
  }

  test("le u128 equals BigInt little-endian reconstruction") {
    val bytes16 = Gen.containerOfN[Array, Byte](16, Gen.choose(
      Byte.MinValue, Byte.MaxValue))
    check(Prop.forAll(bytes16) { b =>
      val expected = (0 until 16).map(i =>
        BigInt(b(i) & 0xff) << (8 * i)).sum
      val got = CodecOps.leU128(b, 0)
      if (expected.toString.length > 38) got == null
      else got.toBigDecimal == BigDecimal(expected)
    })
  }

  test("registry u128 halves reconstruct the unsigned 128-bit value") {
    // the ProtocolRegistry u128 encode path: two LE long halves, low
    // quad first — decode must read them as one unsigned 128-bit value
    val mask = (BigInt(1) << 64) - 1
    check(Prop.forAll { (lo: Long, hi: Long) =>
      val b = CodecOps.leBytes(lo, 8) ++ CodecOps.leBytes(hi, 8)
      val expected = ((BigInt(hi) & mask) << 64) | (BigInt(lo) & mask)
      val got = CodecOps.leU128(b, 0)
      if (expected.toString.length > 38) got == null
      else got.toBigDecimal == BigDecimal(expected)
    })
  }

  test("base58 round-trips arbitrary byte strings") {
    val bytes = Gen.choose(0, 64).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    check(Prop.forAll(bytes) { b =>
      Base58.decode(Base58.encode(b)).toSeq == b.toSeq
    })
  }

  test("wire frame files round-trip arbitrary payload lists") {
    import graft.sources.wire.{GraftWireFrameReader, GraftWireTable}
    val payloads = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 200).flatMap(m =>
        Gen.containerOfN[Array, Byte](m, Gen.choose(
          Byte.MinValue, Byte.MaxValue)))))
    check(Prop.forAll(payloads) { ps =>
      val f = java.io.File.createTempFile("graft_prop", ".bin")
      try {
        val out = new java.io.FileOutputStream(f)
        ps.foreach { p =>
          out.write(Array[Byte](
            (p.length & 0xff).toByte, ((p.length >> 8) & 0xff).toByte,
            ((p.length >> 16) & 0xff).toByte,
            ((p.length >> 24) & 0xff).toByte))
          out.write(p)
        }
        out.close()
        val r = new GraftWireFrameReader(
          f.getAbsolutePath, GraftWireTable.Schema)
        val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Byte]]
        while (r.next()) got += r.get().getBinary(2).toSeq
        r.close()
        got.toSeq == ps.map(_.toSeq)
      } finally f.delete()
    }, n = 100)
  }

  test("bollinger integer predicate equals the exact |x-mu| > k*sigma " +
      "test on every window") {
    // the operator's 64-bit inequality kDen²·(n·x − s1)² > kNum²·(n·s2 − s1²)
    // must decide EXACTLY the same as the textbook band test computed in
    // arbitrary precision — for any window of cent values and k = 3/2
    val window = for {
      n <- Gen.choose(2, 24)
      vs <- Gen.containerOfN[List, Long](n, Gen.choose(0L, 100000L))
    } yield vs
    check(Prop.forAll(window) { vs =>
      val n = vs.length.toLong
      val x = vs.last
      val s1 = vs.sum
      val s2 = vs.map(v => v * v).sum
      val fast = 4L * (n * x - s1) * (n * x - s1) > 9L * (n * s2 - s1 * s1)
      // exact rational check: (x-mu)² > (9/4)·sigma² with mu = s1/n,
      // sigma² = (n·s2 - s1²)/n² — multiply through by 4n² exactly
      val lhs = BigInt(4) * BigInt(n * x - s1).pow(2)
      val rhs = BigInt(9) * (BigInt(n) * BigInt(s2) - BigInt(s1).pow(2))
      fast == (lhs > rhs)
    })
  }
}
