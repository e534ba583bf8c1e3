package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.Scd
import graft.operators.{AsofJoin, ConnectedComponents, PrefixSum, RangeJoin}

/** Randomized properties for the distributed operators, each checked
  * against an independent driver-side reference implementation —
  * the operators must agree with the obvious sequential algorithm on
  * arbitrary inputs, not just on the fixtures they were built
  * against.
  */
class OperatorPropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("connected components agree with driver-side union-find") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(24,
      Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 14L)))
    sample(edgeGen, 8).foreach { edges =>
      val got = ConnectedComponents.components(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // the union rule parent(max) = min makes each root its
      // component's minimum, so the root IS the expected label
      val expected = verts.map(v => v -> find(v)).toMap
      assert(got == expected, s"components mismatch on $edges")
    }
  }

  test("Misra-Gries candidates cover heavy keys on random zipf-ish streams") {
    val agg = graft.functions.MisraGries.MgAggregator(8)
    val streamGen = for {
      n <- Gen.chooseNum(50, 400)
      // skewed alphabet: small ints are much likelier → real heavies
      xs <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.chooseNum(0, 2)), (3, Gen.chooseNum(3, 9)),
        (1, Gen.chooseNum(10, 200))))
    } yield xs.map(i => s"k$i")
    sample(streamGen, 12).foreach { xs =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val floor = xs.size / 9.0 // n/(k+1)
      val heavy = exact.collect { case (k, c) if c > floor => k }.toSet
      // arbitrary 3-way split merged in arbitrary order — the
      // distributed shape the guarantee must survive
      val (a, rest) = xs.splitAt(xs.size / 3)
      val (b, c)    = rest.splitAt(rest.size / 2)
      val parts = Seq(a, b, c).map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = agg.merge(parts(2), agg.merge(parts(0), parts(1)))
      assert(merged.size <= 8, s"capacity violated: ${merged.size}")
      assert(heavy.subsetOf(merged.keySet),
        s"missed heavy keys ${heavy -- merged.keySet} in ${merged.keySet}")
    }
  }

  test("prefix sum agrees with a driver-side scan") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.chooseNum(1, 40)
      keys <- Gen.pick(n, 0 until 1000)
      vals <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
    } yield keys.toSeq.zip(vals)
    sample(rowsGen, 8).foreach { rows =>
      val got = PrefixSum.exclusivePrefixSum(
        rows.toDF("k", "v"), Seq($"k"), $"v", "pre", numPartitions = 3)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      val expected = rows.sortBy(_._1)
        .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
        .sliding(2).map { case Seq((_, acc), (k, _)) => k -> acc }.toMap
      assert(got == expected, s"prefix sums mismatch on $rows")
    }
  }

  test("distributed rank/ntile agree with the window form on random groups") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.chooseNum(2, 60)
      grps <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      scores <- Gen.pick(n, 0 until 10000) // distinct -> total order
    } yield grps.zip(scores.toSeq)
    sample(rowsGen, 6).foreach { rows =>
      val df = rows.toDF("g", "s")
      val got = graft.operators.DistributedRank.rankNtile(
        df, Seq("g"), Seq($"s".desc), ntiles = 4,
        rankName = "r", ntileName = "t", numPartitions = 3)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"s".desc)
      val exp = df.withColumn("r", rank().over(w).cast("long"))
        .withColumn("t", ntile(4).over(w))
      assert(got.exceptAll(exp).count() == 0 &&
        exp.exceptAll(got).count() == 0, s"rank mismatch on $rows")
    }
  }

  test("applyCdc ∘ extractCdc reconstructs the target snapshot") {
    import spark.implicits._
    val snapGen = Gen.mapOf(Gen.zip(Gen.chooseNum(0, 12), Gen.chooseNum(0.0, 99.0)))
    sample(Gen.zip(snapGen, snapGen), 8).foreach { case (oldM, nextM) =>
      val oldDf = oldM.toSeq.toDF("k", "bal")
      val nextDf = nextM.toSeq.toDF("k", "bal")
      val ops = Scd.extractCdc(oldDf, nextDf, Seq("k"))
      val rebuilt = Scd.applyCdc(oldDf, ops, Seq("k"), "op", "op_seq")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(rebuilt == nextM, s"old=$oldM next=$nextM rebuilt=$rebuilt")
      // and the log is minimal: no op for unchanged keys
      val opCount = ops.count()
      val expectedOps = (oldM.keySet ++ nextM.keySet).count { k =>
        oldM.get(k) != nextM.get(k)
      }
      assert(opCount == expectedOps, s"log not change-sized on $oldM -> $nextM")
    }
  }

  test("bounded collect-set agrees with a reference set under any cap") {
    import spark.implicits._
    val gen = for {
      cap <- Gen.chooseNum(1, 6)
      xs <- Gen.listOfN(30, Gen.chooseNum(0L, 9L))
    } yield (cap, xs)
    sample(gen, 10).foreach { case (cap, xs) =>
      val bounded = udaf(
        graft.functions.BoundedList.BoundedListAggregator(cap),
        org.apache.spark.sql.Encoders.scalaLong)
      val got = xs.toDF("x").repartition(3)
        .agg(bounded($"x").as("s")).head.getAs[Seq[Long]]("s")
      val distinct = xs.distinct.sorted
      if (distinct.length > cap)
        assert(got == null, s"cap $cap: expected dropped group for $xs")
      else
        assert(got == distinct, s"cap $cap: $got != $distinct for $xs")
    }
  }

  test("applyCdc agrees with a driver-side sequential apply") {
    import spark.implicits._
    val baseGen = Gen.mapOf(Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0.0, 99.0)))
    val opsGen = Gen.listOfN(12, for {
      k <- Gen.chooseNum(0, 12)
      bal <- Gen.chooseNum(0.0, 99.0)
      op <- Gen.oneOf("I", "U", "D")
    } yield (k, bal, op))
    sample(Gen.zip(baseGen, opsGen), 8).foreach { case (base, ops) =>
      val opsDf = ops.zipWithIndex
        .map { case ((k, bal, op), i) => (k, bal, op, i) }
        .toDF("k", "bal", "op", "seq")
      val baseDf = base.toSeq.toDF("k", "bal")
      val got = Scd.applyCdc(baseDf, opsDf, Seq("k"), "op", "seq")
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getString(2)))
        .toMap
      // sequential reference: apply ops in seq order over the base
      val state = scala.collection.mutable.Map[Int, (Double, String)]()
      base.foreach { case (k, b) => state(k) = (b, "B") }
      ops.foreach {
        case (k, _, "D")   => state.remove(k); state(k) = (Double.NaN, "D")
        case (k, bal, op)  => state(k) = (bal, op)
      }
      val expected = state.toMap.filter(_._2._2 != "D")
      assert(got == expected, s"cdc mismatch: base=$base ops=$ops")
    }
  }

  test("asof nearest agrees with a driver-side scan in both directions") {
    import spark.implicits._
    // distinct right timestamps per key (the operator's documented
    // determinism precondition); left may collide with right freely
    val caseGen = for {
      nl <- Gen.chooseNum(1, 12)
      nr <- Gen.chooseNum(0, 10)
      lks <- Gen.listOfN(nl, Gen.chooseNum(0L, 2L))
      lts <- Gen.listOfN(nl, Gen.chooseNum(0L, 40L))
      rks <- Gen.listOfN(nr, Gen.chooseNum(0L, 2L))
      rts <- Gen.pick(nr, 0L to 40L)
    } yield (lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
             rks.zip(rts).map { case (k, t) => (k, t, k * 1000 + t) })
    sample(caseGen, 10).foreach { case (lefts, rights) =>
      val got = AsofJoin.asofNearest(
          lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "rid"),
          keys = Seq("k"), tsCol = "t", carryCols = Seq("rid"))
        .collect().map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          r.getLong(2) -> (opt(3), opt(4)) // lid -> (back, fwd)
        }.toMap
      lefts.foreach { case (k, t, lid) =>
        val mine = rights.filter(_._1 == k)
        val back = mine.filter(_._2 <= t)
          .sortBy(_._2).lastOption.map(_._3) // inclusive ties
        val fwd = mine.filter(_._2 > t)
          .sortBy(_._2).headOption.map(_._3) // strict
        assert(got(lid) == ((back, fwd)),
          s"asof mismatch at left=($k,$t): got ${got(lid)}, " +
            s"want ($back,$fwd) on lefts=$lefts rights=$rights")
      }
    }
  }

  /** Property form of the r16 NULL-ts contract (AsofJoin object
    * scaladoc, NULL_CONTRACT.md A): under random null injection on
    * BOTH sides, a null-ts right row is never carried in either
    * direction and a null-ts left row keeps its row with null
    * carries — checked against a driver-side reference that models
    * DuckDB's native ASOF (its inequality is never true on NULL).
    */
  test("asof nearest NULL-ts contract holds under random null injection") {
    import spark.implicits._
    val caseGen = for {
      nl <- Gen.chooseNum(1, 12)
      nr <- Gen.chooseNum(0, 10)
      lks <- Gen.listOfN(nl, Gen.chooseNum(0L, 2L))
      lts <- Gen.listOfN(nl, Gen.frequency(
        (3, Gen.chooseNum(0L, 40L).map(Option(_))),
        (1, Gen.const(Option.empty[Long]))))
      rks <- Gen.listOfN(nr, Gen.chooseNum(0L, 2L))
      rts <- Gen.pick(nr, 0L to 40L) // distinct among real ts
      rnull <- Gen.listOfN(nr, Gen.frequency(
        (1, Gen.const(true)), (2, Gen.const(false))))
    } yield (
      lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      rks.lazyZip(rts).lazyZip(rnull).toList.map { case (k, t, isNull) =>
        (k, if (isNull) Option.empty[Long] else Some(t), k * 1000 + t)
      })
    sample(caseGen, 10).foreach { case (lefts, rights) =>
      val got = AsofJoin.asofNearest(
          lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "rid"),
          keys = Seq("k"), tsCol = "t", carryCols = Seq("rid"))
        .collect().map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          r.getLong(2) -> (opt(3), opt(4)) // lid -> (back, fwd)
        }.toMap
      assert(got.size == lefts.size,
        s"LEFT rows must all survive (null ts included): lefts=$lefts")
      lefts.foreach { case (k, tOpt, lid) =>
        val expected = tOpt match {
          case None => (None, None) // null-ts left carries nothing
          case Some(t) =>
            val mine = rights.filter(r => r._1 == k && r._2.isDefined)
            (mine.filter(_._2.get <= t).sortBy(_._2.get).lastOption.map(_._3),
              mine.filter(_._2.get > t).sortBy(_._2.get).headOption.map(_._3))
        }
        assert(got(lid) == expected,
          s"asof null-contract mismatch at left=($k,$tOpt): " +
            s"got ${got(lid)}, want $expected on lefts=$lefts rights=$rights")
      }
    }
  }

  test("rocPoints agrees with a driver-side ROC sweep on random scores") {
    import spark.implicits._
    // integer scores with deliberate ties + at least one row of each
    // label (the operator's documented precondition)
    val caseGen = for {
      n <- Gen.chooseNum(2, 40)
      scores <- Gen.listOfN(n, Gen.chooseNum(0L, 12L))
      labels <- Gen.listOfN(n, Gen.oneOf(0.0, 1.0))
    } yield scores.zip(labels)
    sample(caseGen, 8)
      .map(c => if (c.map(_._2).distinct.size < 2)
        (1L, 1.0) :: (0L, 0.0) :: c else c)
      .foreach { rows =>
        val got = graft.analytics.MlQueries
          .rocPoints(rows.toDF("score", "label"))
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
          .toList
        // reference: descending-threshold sweep over the score grain
        val nPos = rows.count(_._2 == 1.0).toDouble
        val nNeg = rows.size - nPos
        val expected = rows.map(_._1).distinct.sorted.reverse
          .map { thr =>
            val in = rows.filter(_._1 >= thr)
            (thr, in.count(_._2 == 0.0) / nNeg, in.count(_._2 == 1.0) / nPos)
          }
        assert(got == expected, s"roc mismatch on $rows")
      }
  }

  test("proximity join agrees with a driver-side band scan") {
    import spark.implicits._
    val caseGen = for {
      nl <- Gen.chooseNum(1, 12)
      nr <- Gen.chooseNum(0, 12)
      tol <- Gen.chooseNum(1L, 7L)
      lts <- Gen.listOfN(nl, Gen.chooseNum(-30L, 30L))
      rts <- Gen.listOfN(nr, Gen.chooseNum(-30L, 30L))
    } yield (tol, lts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, rts)
    sample(caseGen, 10).foreach { case (tol, lefts, rights) =>
      // Full left-outer multiset — no null filter: unmatched left
      // rows must appear exactly once with a null payload.
      val got = RangeJoin.proximityJoinUs(
          lefts.toDF("lid", "l_us"), rights.toDF("r_us"),
          "l_us", "r_us", tolUs = tol, payload = Nil)
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toList.sorted(Ordering.Tuple2(Ordering.Long, Ordering.Option[Long]))
      val pairs = for {
        (lid, lt) <- lefts
        rt <- rights if math.abs(lt - rt) <= tol
      } yield (lid, Some(rt): Option[Long])
      val matched = pairs.map(_._1).toSet
      val expected = (pairs ++ lefts.map(_._1).filterNot(matched)
          .map(lid => (lid, None: Option[Long])))
        .sorted(Ordering.Tuple2(Ordering.Long, Ordering.Option[Long]))
      assert(got == expected,
        s"band mismatch tol=$tol lefts=$lefts rights=$rights")
    }
  }
}
