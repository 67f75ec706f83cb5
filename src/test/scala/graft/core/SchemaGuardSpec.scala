package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[SchemaGuard.conform]] — the gate every stored-state append
  * path routes its delta through: reject-by-default on any drift
  * (missing / extra / retyped columns), opt-in `align` coercion with the
  * stored schema authoritative, and stored-column-order output either
  * way (appends are positional `insertInto`s).
  */
class SchemaGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stored =
    Seq((1L, "a", 1.5)).toDF("id", "name", "score").schema

  test("exact match passes and re-projects into stored column order") {
    val delta = Seq((0.5, 7L, "x")).toDF("score", "id", "name")
    val out = SchemaGuard.conform(stored, delta, align = false, "t")
    assert(out.columns.toSeq === Seq("id", "name", "score"))
    assert(out.as[(Long, String, Double)].collect().toSeq === Seq((7L, "x", 0.5)))
  }

  test("missing, extra, and retyped columns are rejected with a naming error") {
    val drifted = Seq((7L, 1, "junk")).toDF("id", "score", "extra_col")
    val e = intercept[IllegalArgumentException] {
      SchemaGuard.conform(stored, drifted, align = false, "mystate")
    }
    assert(e.getMessage.contains("mystate"))
    assert(e.getMessage.contains("missing=name"))
    assert(e.getMessage.contains("extra=extra_col"))
    assert(e.getMessage.contains("retyped=score:int->double"))
  }

  test("nullability differences are not drift") {
    // a literal-built column is non-nullable; the stored twin is nullable
    val delta = Seq((1L, "a", 2.0)).toDF("id", "name", "score")
      .withColumn("score", org.apache.spark.sql.functions.lit(3.0))
    SchemaGuard.conform(stored, delta, align = false, "t").collect()
  }

  test("align=true: missing -> typed NULLs, extra dropped, drifted cast to stored type") {
    val drifted = Seq((7, "junk")).toDF("id", "extra_col") // id int, name+score absent
    val out = SchemaGuard.conform(stored, drifted, align = true, "t")
    assert(out.columns.toSeq === Seq("id", "name", "score"))
    assert(out.schema("id").dataType ===
      org.apache.spark.sql.types.LongType, "drifted type cast to stored")
    val row = out.as[(Long, Option[String], Option[Double])].collect().head
    assert(row === ((7L, None, None)))
  }

  test("declared rename maps the old source name onto the stored column") {
    val delta = Seq((7L, "x", 0.5)).toDF("id", "full_name", "score")
    val out = SchemaGuard.conform(stored, delta, align = false, "t",
      renames = Map("full_name" -> "name"))
    assert(out.columns.toSeq === Seq("id", "name", "score"))
    assert(out.as[(Long, String, Double)].collect().toSeq === Seq((7L, "x", 0.5)))
  }

  test("a rename map is inert for an already-migrated batch") {
    val delta = Seq((7L, "x", 0.5)).toDF("id", "name", "score")
    val out = SchemaGuard.conform(stored, delta, align = false, "t",
      renames = Map("full_name" -> "name"))
    assert(out.as[(Long, String, Double)].collect().toSeq === Seq((7L, "x", 0.5)))
  }

  test("a batch carrying BOTH the old and new name is ambiguous and throws") {
    val delta = Seq((7L, "old", "new", 0.5)).toDF("id", "full_name", "name", "score")
    val e = intercept[IllegalArgumentException] {
      SchemaGuard.conform(stored, delta, align = false, "mystate",
        renames = Map("full_name" -> "name"))
    }
    assert(e.getMessage.contains("ambiguous rename"))
    assert(e.getMessage.contains("mystate"))
  }

  test("an UNDECLARED rename still rejects loudly (missing + extra)") {
    val delta = Seq((7L, "x", 0.5)).toDF("id", "full_name", "score")
    val e = intercept[IllegalArgumentException] {
      SchemaGuard.conform(stored, delta, align = false, "mystate")
    }
    assert(e.getMessage.contains("missing=name"))
    assert(e.getMessage.contains("extra=full_name"))
  }
}
