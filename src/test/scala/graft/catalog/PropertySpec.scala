package graft.catalog

import org.scalacheck.Gen


/** Property tests for the pure pieces: LIKE translation and stateless
  * pagination must hold for arbitrary inputs, not just the fixtures.
  * (Raw scalacheck generators; the scalatest bridge isn't on the
  * classpath, so cases are sampled explicitly.) */
class PropertySpec extends graft.SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    Iterator.continually(for (a <- ga.sample; b <- gb.sample) yield (a, b))
      .flatten.take(n).foreach(f.tupled)

  private val plainName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("LIKE without wildcards is exact equality") {
    forAll2(plainName, plainName) { (a: String, b: String) =>
      assert(GraftCatalog.matches(a, Seq(a), Nil))
      if (a != b) assert(!GraftCatalog.matches(a, Seq(b), Nil))
    }
  }

  test("prefix and suffix wildcards behave like startsWith/endsWith") {
    forAll2(plainName, plainName) { (prefix: String, rest: String) =>
      val name = prefix + rest
      assert(GraftCatalog.matches(name, Seq(prefix + "%"), Nil))
      assert(GraftCatalog.matches(name, Seq("%" + rest), Nil))
      assert(!GraftCatalog.matches(name, Nil, Seq(prefix + "%")))
    }
  }

  test("pagination yields every table exactly once for any page size") {
    val cat = new GraftCatalog(spark, sf)
    forAll(Gen.choose(1, graft.Tables.all.size + 2), n = 20) { (pageSize: Int) =>
      var token: Option[String] = None
      var seen = Vector.empty[String]
      var pages = 0
      do {
        val page = cat.listTables(pageSize = pageSize, pageToken = token,
          includeDetailedColumns = false)
        seen ++= page.tables.map(_.name)
        token = page.nextPageToken
        pages += 1
        assert(pages <= graft.Tables.all.size + 1) // no infinite loops
      } while (token.isDefined)
      assert(seen.sorted == graft.Tables.all.sorted.toVector)
      assert(seen.distinct.size == seen.size)
    }
  }
}
