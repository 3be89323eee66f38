package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.types.TypeMapper
import graft.types.TypeMapper.Conversion

/** Ports the reference's self-test case list
  * (reference: lambda/mysql_firebolt_type_mapping.py:350-392) plus the
  * precision edge cases called out in SURVEY §5.
  */
class TypeMapperSpec extends AnyFunSuite {

  test("text family maps to StringType") {
    for (t <- Seq("VARCHAR(255)", "TEXT", "char(10)", "JSON", "ENUM('a','b')", "LONGTEXT", "UUID"))
      assert(TypeMapper.toSparkType(t) == Conversion(Some(StringType), true, TypeMapper.toSparkType(t).message), t)
  }

  test("integer families") {
    assert(TypeMapper.toSparkType("INT").dataType.contains(IntegerType))
    assert(TypeMapper.toSparkType("TINYINT(1)").dataType.contains(IntegerType))
    assert(TypeMapper.toSparkType("MEDIUMINT").dataType.contains(IntegerType))
    assert(TypeMapper.toSparkType("YEAR").dataType.contains(IntegerType))
    assert(TypeMapper.toSparkType("BIGINT").dataType.contains(LongType))
    assert(TypeMapper.toSparkType("INT UNSIGNED").dataType.contains(LongType))
    assert(TypeMapper.toSparkType("BIGINT UNSIGNED").dataType.contains(DecimalType(20, 0)))
    assert(TypeMapper.toSparkType("UINT64").dataType.contains(DecimalType(20, 0)))
  }

  test("unsigned with precision drops the unsigned suffix (reference quirk)") {
    // normalize('INT(10) UNSIGNED') = 'INT' (mapping.py:196-199)
    assert(TypeMapper.normalizeType("INT(10) UNSIGNED") == "INT")
    assert(TypeMapper.toSparkType("INT(10) UNSIGNED").dataType.contains(IntegerType))
  }

  test("decimal precision preserved, capped at 38, scale defaults to 0") {
    assert(TypeMapper.toSparkType("DECIMAL(10,2)").dataType.contains(DecimalType(10, 2)))
    assert(TypeMapper.toSparkType("NUMERIC(50,2)").dataType.contains(DecimalType(38, 2)))
    assert(TypeMapper.toSparkType("DECIMAL(12)").dataType.contains(DecimalType(12, 0)))
    assert(TypeMapper.toSparkType("DECIMAL").dataType.contains(DecimalType(38, 10)))
    // scale exceeding precision is capped (not a valid Spark DecimalType)
    assert(TypeMapper.toSparkType("DECIMAL(5,10)").dataType.contains(DecimalType(5, 5)))
    assert(TypeMapper.toSparkType("NUMERIC(50,45)").dataType.contains(DecimalType(38, 38)))
    assert(TypeMapper.toSparkType("MONEY").dataType.contains(DecimalType(19, 4)))
    assert(TypeMapper.toSparkType("SMALLMONEY").dataType.contains(DecimalType(10, 4)))
  }

  test("float/double/date/timestamp families") {
    assert(TypeMapper.toSparkType("FLOAT").dataType.contains(FloatType))
    assert(TypeMapper.toSparkType("DOUBLE").dataType.contains(DoubleType))
    assert(TypeMapper.toSparkType("DATE").dataType.contains(DateType))
    assert(TypeMapper.toSparkType("DATETIME").dataType.contains(TimestampNTZType))
    assert(TypeMapper.toSparkType("TIMESTAMP_MS").dataType.contains(TimestampNTZType))
    assert(TypeMapper.toSparkType("TIMESTAMP").dataType.contains(TimestampType))
    assert(TypeMapper.toSparkType("TIMESTAMPTZ").dataType.contains(TimestampType))
    assert(TypeMapper.toSparkType("TIME").dataType.contains(StringType))
    assert(TypeMapper.toSparkType("BOOLEAN").dataType.contains(BooleanType))
    assert(TypeMapper.toSparkType("BIT(1)").dataType.contains(BooleanType))
  }

  test("binary coerced to string (reference behavior)") {
    for (t <- Seq("BLOB", "VARBINARY(255)", "BYTEA", "IMAGE"))
      assert(TypeMapper.toSparkType(t).dataType.contains(StringType), t)
  }

  test("spatial/complex types require manual intervention") {
    for (t <- Seq("GEOMETRY", "POINT", "GEOGRAPHY", "ARRAY", "STRUCT", "MAP", "ROW", "TUPLE")) {
      val c = TypeMapper.toSparkType(t)
      assert(c.dataType.isEmpty && !c.isSafe, t)
    }
    // parameterized generics fall through to the unknown→TEXT-unsafe path,
    // exactly like the reference (ARRAY<STRING> → TEXT fallback, is_safe
    // False; mapping.py:292-293 with test case at :373)
    val arr = TypeMapper.toSparkType("ARRAY<STRING>")
    assert(arr.dataType.contains(StringType) && !arr.isSafe)
  }

  test("unknown type falls back to StringType, unsafe") {
    val c = TypeMapper.toSparkType("WEIRDTYPE(9000)")
    assert(c.dataType.contains(StringType) && !c.isSafe)
    assert(TypeMapper.toSparkType("").dataType.isEmpty)
  }

  test("extractPrecision") {
    assert(TypeMapper.extractPrecision("DECIMAL(10,2)").contains((10, Some(2))))
    assert(TypeMapper.extractPrecision("VARCHAR(255)").contains((255, None)))
    assert(TypeMapper.extractPrecision("INT").isEmpty)
  }

  test("string-level compatibility groups (reference mapping.py:296-324)") {
    assert(TypeMapper.isTypeCompatible("VARCHAR(10)", "TEXT"))
    assert(TypeMapper.isTypeCompatible("INT", "SMALLINT"))
    assert(!TypeMapper.isTypeCompatible("INT", "BIGINT")) // separate groups
    assert(TypeMapper.isTypeCompatible("TIMESTAMP", "DATETIME"))
    assert(TypeMapper.isTypeCompatible("DECIMAL(10,2)", "NUMERIC(38,10)"))
    assert(!TypeMapper.isTypeCompatible("DECIMAL", "DOUBLE"))
  }

  test("spark-level compatibility mirrors the groups") {
    assert(TypeMapper.isSparkTypeCompatible(IntegerType, ShortType))
    assert(!TypeMapper.isSparkTypeCompatible(IntegerType, LongType))
    assert(TypeMapper.isSparkTypeCompatible(FloatType, DoubleType))
    assert(TypeMapper.isSparkTypeCompatible(DecimalType(10, 2), DecimalType(38, 10)))
    assert(!TypeMapper.isSparkTypeCompatible(DecimalType(10, 2), DoubleType))
    assert(TypeMapper.isSparkTypeCompatible(TimestampType, TimestampNTZType))
  }
}
