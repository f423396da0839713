package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.scalacheck.Gen
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the pure compute cores of the round-7 function
  * additions — invariants that must hold for arbitrary inputs, not
  * just the fixtures. (Raw scalacheck generators, sampled explicitly,
  * same pattern as `graft.catalog.PropertySpec`.) */
class FunctionPropertySpec extends graft.SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  private def arr(xs: Seq[Double]) = new GenericArrayData(xs.toArray)
  private def arrI(xs: Seq[Int]) = new GenericArrayData(xs.toArray)

  // scores drawn from a SMALL value set so ties are common
  private val scored: Gen[List[(Double, Int)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.choose(0, 5).map(_ * 0.25)
      l <- Gen.oneOf(0, 1)
    } yield (s, l))

  test("property: base32/unbin/morton/ULID round-trips and hasSubsequence vs a reference") {
    import org.apache.spark.unsafe.types.UTF8String
    CHFunctions.register(spark)
    // base32: encode(decode) identity over random ASCII strings
    forAll(Gen.asciiPrintableStr, 80) { s =>
      val enc = Base32.run(UTF8String.fromString(s), Base32.Encode)
      val dec = Base32.run(enc, Base32.Decode)
      assert(dec.toString == s, s"base32 '$s' -> '$enc' -> '$dec'")
    }
    // hasSubsequence agrees with a direct two-pointer reference
    val strPair = for {
      h <- Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      n <- Gen.listOfN(3, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    } yield (h, n)
    def ref(h: String, n: String): Boolean = {
      var i = 0
      h.foreach { c => if (i < n.length && c == n(i)) i += 1 }
      i == n.length
    }
    forAll(strPair, 60) { case (h, n) =>
      val got = spark.sql(
        s"SELECT hasSubsequence('$h', '$n')").collect().head.getBoolean(0)
      assert(got == ref(h, n), s"hasSubsequence('$h', '$n')")
    }
    // morton encode/decode round-trips 32-bit coordinates
    val coords = for {
      x <- Gen.choose(0, Int.MaxValue)
      y <- Gen.choose(0, Int.MaxValue)
    } yield (x.toLong, y.toLong)
    forAll(coords, 40) { case (x, y) =>
      val r = spark.sql(
        s"SELECT mortonDecode(2, mortonEncode($x, $y))").collect().head
      val st = r.getStruct(0)
      assert(st.getLong(0) == x && st.getLong(1) == y, s"morton($x, $y)")
    }
    // unbin(bin(x)) recovers the number's bytes rendered as text
    forAll(Gen.choose(1, 255), 30) { b =>
      val r = spark.sql(s"SELECT unbin(bin($b))").collect().head.getString(0)
      assert(r == new String(Array(b.toByte),
        java.nio.charset.StandardCharsets.ISO_8859_1) || b > 127,
        s"unbin(bin($b)) = '$r'")
    }
  }

  test("arrayAUC equals the O(n^2) pair-counting definition") {
    forAll(scored) { pairs =>
      val auc = VectorOps.auc(arr(pairs.map(_._1)), arrI(pairs.map(_._2)))
      val pos = pairs.filter(_._2 == 1).map(_._1)
      val neg = pairs.filter(_._2 == 0).map(_._1)
      if (pos.isEmpty || neg.isEmpty) assert(auc.isNaN)
      else {
        val wins = (for (p <- pos; q <- neg) yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val expect = wins / (pos.size.toDouble * neg.size)
        assert(math.abs(auc - expect) < 1e-12, s"$pairs: $auc vs $expect")
      }
    }
  }

  private val series: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(for {
      x <- Gen.choose(0, 1000)
      y <- Gen.choose(-50, 50)
    } yield (x.toDouble, y.toDouble))

  test("lttb keeps endpoints, output size min(n, m), points from the input") {
    forAll(series) { pts =>
      val n = 3 + pts.size % 17
      val agg = LttbAgg(Literal(0.0), Literal(0.0), n)
      val buf = ArrayBuffer.empty[Double]
      pts.foreach { case (x, y) => buf += x += y }
      val out = agg.eval(buf).asInstanceOf[GenericArrayData]
      val sel = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2)
        (r.getDouble(0), r.getDouble(1))
      }
      val sorted = pts.sorted
      assert(sel.size == math.min(n, pts.size))
      assert(sel.head == sorted.head && sel.last == sorted.last)
      assert(sel.forall(pts.contains)) // only input points, never averages
      assert(sel == sel.sorted) // selection preserves x-order
    }
  }

  private val tokens: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))

  test("spanKeys: count = max(n-len+1, 1) and equal spans get equal keys") {
    forAll(tokens) { toks =>
      val len = 1 + toks.size % 5
      val keys = SpanKeys.compute(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray), len)
      val k = keys.numElements()
      assert(k == math.max(toks.size - len + 1, 1))
      // same span text must always produce the same key (the converse
      // — collisions — is allowed and handled downstream)
      val spans = (0 until k).map(i => toks.slice(i, i + len).mkString(" "))
      val byText = spans.zipWithIndex.groupBy(_._1)
      byText.values.foreach { occ =>
        val ks = occ.map { case (_, i) => keys.getLong(i) }.distinct
        assert(ks.size == 1, s"span '${occ.head._1}' got keys $ks")
      }
    }
  }

  test("adcScore equals the naive lookup sum") {
    val cases: Gen[(List[Int], List[Double], Int)] = for {
      m <- Gen.choose(1, 8)
      k <- Gen.choose(1, 16)
      codes <- Gen.listOfN(m, Gen.choose(0, k - 1))
      adc <- Gen.listOfN(m * k, Gen.choose(-100, 100).map(_ / 7.0))
    } yield (codes, adc, k)
    forAll(cases) { case (codes, adc, k) =>
      val got = VectorOps.adcScore(
        new GenericArrayData(codes.map(_.toLong).toArray), arr(adc), k)
      val expect = codes.zipWithIndex.map { case (c, j) => adc(j * k + c) }.sum
      assert(got == expect) // same left-to-right accumulation order
    }
  }
}
