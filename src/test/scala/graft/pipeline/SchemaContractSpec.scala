package graft.pipeline

import org.apache.spark.SparkException
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Write-time schema-contract enforcement: nullable additions admit,
  * removals / type changes / non-nullable additions refuse.
  */
class SchemaContractSpec extends AnyFunSuite {
  private val contract = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)))

  test("identical schema: all ok, enforce passes") {
    val checks = SchemaContract.enforce(contract, contract)
    assert(checks.forall(c => c.status == "ok" && c.allowed))
  }

  test("nullable addition admits; non-nullable addition refuses") {
    val plus = contract.add(StructField("w", IntegerType, nullable = true))
    assert(SchemaContract.diff(contract, plus)
      .exists(c => c.column == "w" && c.status == "added" && c.allowed))
    val strict = contract.add(StructField("w", IntegerType, nullable = false))
    val bad = SchemaContract.diff(contract, strict)
      .find(_.column == "w").get
    assert(bad.status == "added" && !bad.allowed)
    val ex = intercept[SparkException] {
      SchemaContract.enforce(contract, strict)
    }
    assert(ex.getMessage.contains("added w"), ex.getMessage)
  }

  test("nullability relaxation refuses; tightening stays ok (ADVICE r13)") {
    // contract promises NON-NULL id; an arriving vintage relaxing it to
    // nullable would surface NULLs to readers trusting the promise
    val relaxed = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("v", DoubleType, nullable = true)))
    val d = SchemaContract.diff(contract, relaxed)
    val idCheck = d.find(_.column == "id").get
    assert(idCheck.status === "nullability_relaxed" && !idCheck.allowed)
    assert(d.find(_.column == "v").get.status === "ok")
    intercept[SparkException] { SchemaContract.enforce(contract, relaxed) }
    // tightening (nullable contract column arriving non-null) is fine
    val tightened = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    assert(SchemaContract.diff(contract, tightened)
      .forall(c => c.status == "ok" && c.allowed))
  }

  test("removal and type change refuse with named columns") {
    val removed = StructType(contract.fields.filter(_.name != "v"))
    val exR = intercept[SparkException] {
      SchemaContract.enforce(contract, removed)
    }
    assert(exR.getMessage.contains("removed v"), exR.getMessage)
    val retyped = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val c = SchemaContract.diff(contract, retyped).find(_.column == "v").get
    assert(c.status == "type_changed" && !c.allowed &&
      c.dtype == "double->string")
  }

  test("column order: contract order first, then new arrivals") {
    val plus = contract.add(StructField("a_new", IntegerType, nullable = true))
    assert(SchemaContract.diff(contract, plus).map(_.column) ===
      Seq("id", "v", "a_new"))
  }
}
