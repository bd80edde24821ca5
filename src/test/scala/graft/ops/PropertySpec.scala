package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F64, VarPolicy}

/** Property-based invariants (SURVEY §5 bonus):
  *  - resampling onto the identical grid is the identity
  *  - nearest 2x upscale followed by center 2x downscale is the identity
  *  - coarsen(sum) preserves the image total
  * (raw ScalaCheck generators; the scalatest bridge isn't in the
  * offline dependency cache)
  */
class PropertySpec extends AnyFunSuite {

  val genImage: Gen[Array[Array[Double]]] = for {
    h <- Gen.choose(2, 6)
    w <- Gen.choose(2, 6)
    cells <- Gen.listOfN(h * w, Gen.choose(-50, 50).map(_.toDouble))
  } yield cells.grouped(w).map(_.toArray).toArray

  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(k => g.apply(Gen.Parameters.default, Seed(42L + k)))

  def gmFor(img: Array[Array[Double]], res: Double = 0.5): GridMapping =
    GridMapping.regular(img(0).length, img.length, 0.0, 0.0, res, res, Crs.Geographic)

  val pol = Map("v" -> VarPolicy(Interp.NEAREST, Reducers.Mean, false, Double.NaN, F64))

  test("identity resample returns the input unchanged") {
    samples(genImage, 5).foreach { img =>
      val gm = gmFor(img)
      val (out, _) = ResampleInSpace(toDs(tilesFrom("v", img, gm)), None, gm, Some(gm), pol)
      assertImage(toArray(out.collect().toSeq, gm, "v"), img)
    }
  }

  test("center-aligned nearest upscale x2 then center coarsen x2 is the identity") {
    // quarter-pixel-shifted target makes the 2x nearest upscale an
    // exact replication (the unshifted edge-affine convention rounds
    // asymmetrically, so the naive roundtrip is NOT an identity)
    samples(genImage, 5).foreach { img =>
      val gm = gmFor(img)
      val up = GridMapping.regular(gm.width * 2, gm.height * 2,
        gm.xMin - gm.xRes / 4, gm.yMin + gm.yRes / 4,
        gm.xRes / 2, gm.yRes / 2, Crs.Geographic)
      val upTiles = AffineOp.affineTransform(toDs(tilesFrom("v", img, gm)), gm, up, pol)
      val back = CoarsenOp.coarsenTiles(upTiles, 2, 2, _ => (Reducers.Center, false))
      val backImg = Array.tabulate(gm.height, gm.width) { (j, i) => 0.0 }
      back.collect().foreach { t =>
        for (j <- 0 until t.h; i <- 0 until t.w)
          backImg(t.tj * gm.height + j)(t.ti * gm.width + i) = t.data(j * t.w + i)
      }
      assertImage(backImg, img)
    }
  }

  test("coarsen(sum) preserves the image total for divisor-aligned tilings") {
    for (th <- 1 to 2; tw <- 1 to 2) {
      val img = Array.tabulate(4, 4)((j, i) => (j * 4 + i).toDouble)
      val gm = GridMapping.regular(4, 4, 0.0, 0.0, 1.0, 1.0, Crs.Geographic,
        tileSize = Some((2 * tw, 2 * th)))
      val tiles = toDs(tilesFrom("v", img, gm))
      val out = CoarsenOp.coarsenTiles(tiles, 2, 2, _ => (Reducers.Sum, false)).collect()
      val total = out.map(_.data.sum).sum
      assert(math.abs(total - img.flatten.sum) < 1e-9)
    }
  }

  test("winnowing matches an independent sequential reference model on random docs") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val k = 5; val w = 3
    // sequential robust winnowing straight from the paper's definition
    def model(text: String): Set[(Long, Long)] = {
      val ng = text.length - (k - 1)
      if (ng < w) Set.empty
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = Array.tabulate(ng)(p => graft.text.TextOps.tokenHashJvm(md, text.substring(p, p + k)))
        (0 until ng - w + 1).map { ws =>
          // rightmost minimal hash in [ws, ws+w-1]
          var best = ws
          for (p <- ws + 1 until ws + w)
            if (hs(p) < hs(best) || (hs(p) == hs(best) && p > best)) best = p
          ((best + 1).toLong, hs(best)) // 1-based pos
        }.toSet
      }
    }
    val genDoc = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.oneOf("abc d".toSeq)) // tiny alphabet -> frequent hash ties
    } yield cs.mkString
    val docsList = samples(genDoc, 30).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.text.TextOps.winnowFingerprints(
        docsList.toDF("doc_id", "text"), k, w)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docsList.foreach { case (id, text) =>
      val want = model(text)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id '$text'")
    }
  }

  test("greedy piece walk matches an independent recursive matcher on random vocabularies") {
    // differential test: the imperative code-point walk in
    // TextOps.greedyPieceCount vs a structurally different recursive
    // prefix matcher, over random words and random vocabularies
    // (including ones missing single characters, so the [UNK] path is
    // exercised, and overshoot-prone long pieces)
    import graft.text.TextOps
    val genWord = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genPiece = for {
      n <- Gen.choose(2, 4)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genVocab = for {
      k <- Gen.choose(0, 6)
      ps <- Gen.listOfN(k, genPiece)
      singles <- Gen.someOf(Seq("a", "b", "c"))
    } yield (ps ++ singles).toSet
    def ref(w: String, vocab: Set[String]): (Long, Long) = {
      val maxLen = vocab.map(_.length).max
      def go(rest: String, acc: Long): (Long, Long) =
        if (rest.isEmpty) (acc, 0L)
        else (math.min(maxLen, rest.length) to 1 by -1).iterator
          .map(rest.take).find(vocab.contains) match {
            case Some(p) => go(rest.drop(p.length), acc + 1)
            case None => (1L, 1L)
          }
      go(w, 0L)
    }
    var unks = 0
    samples(Gen.zip(genWord, genVocab), 300).zipWithIndex.foreach {
      case ((w, vocab), i) if vocab.nonEmpty =>
        val mx = vocab.map(_.length).max
        val want = ref(w, vocab)
        assert(TextOps.greedyPieceCount(w, vocab, mx) === want,
          s"case $i: w=$w vocab=$vocab")
        if (want._2 == 1L) unks += 1
      case _ => ()
    }
    assert(unks > 0, "degenerate sample: the [UNK] path was never exercised")
  }
}
