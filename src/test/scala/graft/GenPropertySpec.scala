package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven invariants (SURVEY §5.2#4): the operator algebra must
  * hold on arbitrary inputs, not just the fixtures. Plain ScalaCheck Gen
  * with FIXED seeds (no scalatestplus bridge in the offline dep set, and
  * deterministic cases reproduce exactly on failure). Cases stay small —
  * the goal is semantic coverage, not load.
  */
class GenPropertySpec extends AnyFunSuite {
  import SparkFixture._

  /** 5 deterministic samples per property. */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      val a = g.apply(Gen.Parameters.default.withSize(40), Seed(42L + i))
        .getOrElse(fail(s"generator returned no sample for seed ${42L + i}"))
      body(a)
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(p => body(p._1, p._2))

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.chooseNum(0L, 5L)
      day <- Gen.chooseNum(0L, 9L)
      v <- Gen.chooseNum(-100, 100).map(_.toDouble)
    } yield (user, day, v))

  test("groupBy sum is union-decomposable (partial agg soundness)") {
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("user", "day", "v")
      val whole = df.groupBy($"user").agg(sum($"v").as("s"))
      val halves = df.filter($"day" < 5).unionByName(df.filter($"day" >= 5))
        .groupBy($"user").agg(sum($"v").as("s"))
      assert(whole.exceptAll(halves).count() == 0 &&
        halves.exceptAll(whole).count() == 0)
    }
  }

  test("dropDuplicates is idempotent and minimal") {
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("user", "day", "v")
      val once = df.dropDuplicates()
      assert(once.count() == once.dropDuplicates().count())
      assert(once.count() == rows.distinct.size)
    }
  }

  test("running total final row equals total sum per key") {
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("user", "day", "v")
        .groupBy($"user", $"day").agg(sum($"v").as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user").orderBy($"day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val finals = df.withColumn("rt", sum($"v").over(w))
        .groupBy($"user").agg(max(struct($"day", $"rt")).getField("rt").as("final"))
      val direct = df.groupBy($"user").agg(sum($"v").as("total"))
      val bad = finals.join(direct, "user")
        .filter(abs($"final" - $"total") > 1e-9)
      assert(bad.count() == 0)
    }
  }

  test("left_semi ∪ left_anti partitions the left side") {
    forAll(rowsGen, rowsGen) { (l, r) =>
      import spark.implicits._
      val left = l.toDF("user", "day", "v")
      val right = r.toDF("user", "day", "v").select($"user").distinct()
      val semi = left.join(right, Seq("user"), "left_semi")
      val anti = left.join(right, Seq("user"), "left_anti")
      assert(semi.count() + anti.count() == left.count())
      assert(semi.join(anti.select($"user").distinct(), Seq("user"), "left_semi").count() == 0)
    }
  }

  test("limit/offset pagination covers exactly the sorted prefix") {
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((u, d, v), i) => (i.toLong, u, d, v) }
        .toDF("id", "user", "day", "v")
      val page1 = df.orderBy($"id").limit(3).collect().map(_.getLong(0)).toSeq
      val page2 = df.orderBy($"id").offset(3).limit(3).collect().map(_.getLong(0)).toSeq
      val all = df.orderBy($"id").limit(6).collect().map(_.getLong(0)).toSeq
      assert(page1 ++ page2 == all)
    }
  }
}
