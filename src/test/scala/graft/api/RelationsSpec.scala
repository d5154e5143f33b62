package graft.api

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Nested (API-faithful) relation resolution — all six kinds
  * (reference: src/QueryBuilder.ts:330-485). */
class RelationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nations = Seq((1, "JP", 10), (2, "FR", 20)).toDF("nkey", "nname", "rkey")
  private lazy val regions = Seq((10, "ASIA"), (20, "EUROPE"), (30, "EMPTY")).toDF("rkey", "rname")
  private lazy val custs = Seq(
    (100, "alice", 1), (101, "bob", 1), (102, "carol", 2), (103, "dave", 99)
  ).toDF("ckey", "cname", "nkey")
  private lazy val orders = Seq(
    (1000, 100), (1001, 100), (1002, 102)
  ).toDF("okey", "ckey")
  private lazy val posts = Seq(
    ("p1", Seq("t1", "t2")), ("p2", Seq("t2")), ("p3", Seq.empty[String])
  ).toDF("slug", "tagIds")
  private lazy val tagsDf = Seq(("t1", "scala"), ("t2", "spark")).toDF("tid", "tname")

  test("hasOne attaches a single struct (null when no match)") {
    val out = Relations.nested(custs, HasOne("nation", "nation", "nkey", "nkey"), nations)
      .orderBy("ckey").collect()
    assert(out(0).getAs[Row]("nation").getAs[String]("nname") == "JP")
    assert(out(3).getAs[Row]("nation") == null) // dave's nation 99 doesn't exist
  }

  test("hasMany attaches a (possibly empty) array") {
    val out = Relations.nested(custs, HasMany("orders", "orders", "ckey", "ckey"), orders)
      .orderBy("ckey").collect()
    assert(out(0).getAs[scala.collection.Seq[Row]]("orders").map(_.getAs[Int]("okey")).sorted == Seq(1000, 1001))
    assert(out(1).getAs[scala.collection.Seq[Row]]("orders").isEmpty)
  }

  test("belongsTo attaches matches as an array (reference semantics)") {
    val out = Relations.nested(orders, BelongsTo("customer", "customer", "ckey", "ckey"), custs)
      .orderBy("okey").collect()
    assert(out(0).getAs[scala.collection.Seq[Row]]("customer").map(_.getAs[String]("cname")) == Seq("alice"))
  }

  test("belongsToMany joins through an array-valued local key") {
    val out = Relations.nested(posts, BelongsToMany("tags", "tags", "tagIds", "tid"), tagsDf)
      .orderBy("slug").collect()
    assert(out(0).getAs[scala.collection.Seq[Row]]("tags").map(_.getAs[String]("tname")).sorted == Seq("scala", "spark"))
    assert(out(1).getAs[scala.collection.Seq[Row]]("tags").map(_.getAs[String]("tname")) == Seq("spark"))
    assert(out(2).getAs[scala.collection.Seq[Row]]("tags").isEmpty)
  }

  test("hasOneThrough resolves two hops to a single struct") {
    val rel = HasOneThrough("region", "region", "nation", "nkey", "nkey", "rkey", "rkey")
    val out = Relations.nested(custs, rel, regions, through = Some(nations))
      .orderBy("ckey").collect()
    assert(out(0).getAs[Row]("region").getAs[String]("rname") == "ASIA")
    assert(out(2).getAs[Row]("region").getAs[String]("rname") == "EUROPE")
    assert(out(3).getAs[Row]("region") == null)
  }

  test("hasManyThrough resolves two hops to an array") {
    val rel = HasManyThrough("customers", "customer", "nation", "rkey", "rkey", "nkey", "nkey")
    val out = Relations.nested(regions, rel, custs, through = Some(nations))
      .orderBy("rkey").collect()
    assert(out(0).getAs[scala.collection.Seq[Row]]("customers").map(_.getAs[String]("cname")).sorted == Seq("alice", "bob"))
    assert(out(1).getAs[scala.collection.Seq[Row]]("customers").map(_.getAs[String]("cname")) == Seq("carol"))
    assert(out(2).getAs[scala.collection.Seq[Row]]("customers").isEmpty)
  }

  test("flat join multiplies rows for *Many and preserves all base rows on left") {
    val flat = Relations.flatJoin(custs, orders, "ckey", "ckey", joinType = "left")
    assert(flat.count() == 5) // alice×2, bob×1(null), carol×1, dave×1(null)
  }
}
