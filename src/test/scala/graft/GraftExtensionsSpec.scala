package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native functions are usable from SQL once registered") {
    graft.functions.VectorExpressions.register(spark)
    graft.functions.TextExpressions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                vec_normalize(array(3.0D, 4.0D)) AS n,
                sorted_long_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c,
                text_shingles('the quick brown fox', 2) AS sh""").collect().head
    assert(r.getDouble(0) === 11.0)
    r.getSeq[Double](1).zip(Seq(0.6, 0.8)).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-12)
    }
    assert(r.getInt(2) === 2)
    assert(r.getSeq[String](3) === Seq("the quick", "quick brown", "brown fox"))
  }

  test("GraftExtensions installs all function builders without error") {
    // the injection path a cluster uses via spark.sql.extensions; builders
    // must construct well-formed expressions
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val dot = graft.functions.VectorExpressions.VectorDot(
      Literal.create(Array(1.0, 2.0)), Literal.create(Array(3.0, 4.0)))
    assert(dot.eval(null) === 11.0)
  }
}
