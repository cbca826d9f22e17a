package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("joinWithSuffixes renames colliding non-key columns and keeps keys single") {
    val l = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "name", "v")
    val r = Seq((1, "A", 100), (3, "C", 300)).toDF("k", "name", "w")
    val j = joinWithSuffixes(l, r, Seq("k"), "full_outer")
    assert(j.columns.toSeq == Seq("k", "name", "v", "name_y", "w"))
    val row1 = j.filter($"k" === 1).collect().head
    assert(row1.getAs[String]("name") == "a" && row1.getAs[String]("name_y") == "A")
    assert(j.count() == 3)
  }

  test("keepFirst keeps exactly one deterministic survivor per key group") {
    val df = Seq(
      ("g1", 5, "x"), ("g1", 9, "y"), ("g1", 9, "a"),
      ("g2", 1, "z")).toDF("g", "score", "tag")
    val out = keepFirst(df, Seq("g"), Seq($"score".desc, $"tag"))
    val m = out.collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(m == Map("g1" -> ((9, "a")), "g2" -> ((1, "z"))))
  }

  test("coalesceRepair fills nulls from suffixed twin and drops it") {
    val df = Seq(
      (1, Option("a"), Option("fallback")),
      (2, Option.empty[String], Option("b")),
      (3, Option.empty[String], Option.empty[String])).toDF("k", "c", "c_y")
    val out = coalesceRepair(df, Seq("c"))
    assert(out.columns.toSeq == Seq("k", "c"))
    val m = out.collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(m == Map(1 -> Some("a"), 2 -> Some("b"), 3 -> None))
  }

  test("keyMirror exposes each row under every alternative key in one pass") {
    val df = Seq((10, 20, "r1")).toDF("ek", "sk", "payload")
    val out = keyMirror(df, "joinkey", Seq($"ek", $"sk"))
    assert(out.select("joinkey").as[Int].collect().sorted.toSeq == Seq(10, 20))
    assert(out.count() == 2)
  }

  test("unionStrata aligns by name and null-pads missing columns") {
    val a = Seq((1, "x")).toDF("k", "only_a")
    val b = Seq((2, 3.5)).toDF("k", "only_b")
    val u = unionStrata(Seq(a, b))
    assert(u.columns.sorted.toSeq == Seq("k", "only_a", "only_b"))
    assert(u.count() == 2)
    assert(u.filter($"k" === 2).select("only_a").collect().head.isNullAt(0))
  }

  test("hierarchicalEnrich: most-specific level wins, then falls back") {
    val data = Seq(
      (1, "c1", 10), // matches level 1 (custkey+nkey)
      (2, "c1", 99), // wrong nkey -> level 2 on custkey
      (3, "zz", 10)  // no match at any level
    ).toDF("id", "custkey", "nkey")
    val dim = Seq(
      ("c1", 10, "exact", 5.0),
      ("c1", 11, "loose", 9.0)).toDF("custkey", "nkey", "label", "bal")
    val out = hierarchicalEnrich(
      data, dim,
      keyLevels = Seq(Seq("custkey", "nkey"), Seq("custkey")),
      payloadCols = Seq("label"),
      dimOrder = Seq($"bal".desc))
    val m = out.collect()
      .map(r => r.getAs[Int]("id") -> ((Option(r.getAs[String]("label")), Option(r.getAs[Any]("match_level"))))).toMap
    assert(m(1) == ((Some("exact"), Some(1))))
    assert(m(2) == ((Some("loose"), Some(2)))) // level-2 survivor is max bal = "loose"
    assert(m(3) == ((None, None)))
  }

  test("hierarchicalEnrich conserves rows (G3 law) and dropUnmatched drops misses") {
    val data = (1 to 200).map(i => (i, s"c${i % 7}", i % 3)).toDF("id", "custkey", "nkey")
    val dim = (0 until 5).map(i => (s"c$i", i % 3, s"p$i", i.toDouble)).toDF("custkey", "nkey", "p", "b")
    val kept = hierarchicalEnrich(data, dim, Seq(Seq("custkey", "nkey"), Seq("custkey")),
      Seq("p"), Seq($"b".desc))
    assert(kept.count() == 200)
    val dropped = hierarchicalEnrich(data, dim, Seq(Seq("custkey", "nkey"), Seq("custkey")),
      Seq("p"), Seq($"b".desc), dropUnmatched = true)
    assert(dropped.count() == data.filter($"custkey".isin((0 until 5).map(i => s"c$i"): _*)).count())
  }

  test("hierarchicalEnrich equals the reference's sequential join/split/union cascade") {
    // Oracle: literal three-pass cascade as the reference writes it
    // (/root/reference/down/down_water_prep.py:504-532).
    val data = (1 to 300).map(i => (i, s"c${i % 11}", i % 4)).toDF("id", "custkey", "nkey")
    val dim = (0 until 8).map(i => (s"c$i", i % 4, s"pay$i", i.toDouble))
      .toDF("custkey", "nkey", "p", "b")

    val fast = hierarchicalEnrich(data, dim, Seq(Seq("custkey", "nkey"), Seq("custkey")),
      Seq("p"), Seq($"b".desc, $"p"))
      .select("id", "custkey", "nkey", "p")

    val d1 = keepFirst(dim.select("custkey", "nkey", "p", "b"), Seq("custkey", "nkey"), Seq($"b".desc, $"p"))
      .withColumnRenamed("p", "p1").drop("b")
    val d2 = keepFirst(dim.select("custkey", "p", "b"), Seq("custkey"), Seq($"b".desc, $"p"))
      .withColumnRenamed("p", "p2").drop("b")
    val l1 = data.join(d1, Seq("custkey", "nkey"), "left")
    val hit1 = l1.filter($"p1".isNotNull).withColumnRenamed("p1", "p")
    val miss1 = l1.filter($"p1".isNull).select("id", "custkey", "nkey")
    val l2 = miss1.join(d2, Seq("custkey"), "left").withColumnRenamed("p2", "p")
    val slow = hit1.select("id", "custkey", "nkey", "p")
      .unionByName(l2.select("id", "custkey", "nkey", "p"))

    assertSameRows(fast, slow)
  }

  test("trailingWindowAgg (add/remove ledger) equals the sliding RANGE frame exactly") {
    // adversarial fixture: duplicate timestamps (peers), a row landing
    // EXACTLY width before another (boundary must stay inclusive), a
    // null value (counts in n, skipped by sum), and a second key
    val rows = Seq(
      ("u1", 1L, 0L, Some(10.0)),
      ("u1", 2L, 0L, Some(5.0)),    // peer at t=0
      ("u1", 3L, 40L, None),        // null value
      ("u1", 4L, 100L, Some(2.5)),  // exactly width after t=0
      ("u1", 5L, 101L, Some(1.0)),  // the t=0 rows just expired
      ("u1", 6L, 240L, Some(7.0)),
      ("u2", 7L, 50L, Some(3.0)),
      ("u2", 8L, 150L, Some(4.0)))  // exactly width after t=50
      .toDF("user_id", "event_id", "t", "v0")
      .withColumn("v", $"v0".cast("decimal(18,2)")).drop("v0")
    val ledger = trailingWindowAgg(rows, Seq("user_id"), "t", "event_id",
      $"v", width = 100L).select("user_id", "event_id", "n_trail", "sum_trail")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t").rangeBetween(-100L, 0L)
    val frame = rows
      .withColumn("n_trail", count(lit(1)).over(w))
      .withColumn("sum_trail", sum($"v").over(w))
      .select("user_id", "event_id", "n_trail", "sum_trail")
    assertSameRows(ledger, frame)
    // boundary inclusion: event 4's frame [0, 100] holds both t=0 peers
    val e4 = ledger.filter($"event_id" === 4).collect().head
    assert(e4.getLong(2) == 4 && e4.getDecimal(3).doubleValue() == 17.5)
    // one tick later the peers are gone
    assert(ledger.filter($"event_id" === 5).collect().head.getLong(2) == 3)
  }
}
