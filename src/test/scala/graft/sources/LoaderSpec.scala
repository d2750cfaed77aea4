package graft.sources

import graft.SparkSpec
import graft.contracts.{ColumnSpec, EdgeContract}
import org.apache.spark.sql.types._
import java.nio.file.Files

class LoaderSpec extends SparkSpec {
  import spark.implicits._

  private val contract = EdgeContract("loans", Seq(
    "loan_reference" -> ColumnSpec(StringType, required = true),
    "drawn_amount" -> ColumnSpec(DoubleType),
    "is_defaulted" -> ColumnSpec(BooleanType, default = Some(false)),
    "value_date" -> ColumnSpec(DateType)))

  test("CSV load: header, alias translation, typed conform, boolean default") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val csv = s"$dir/loans.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "LOAN_ID , drawn_amount,value_date,junk\n" +
      "L1,100.25,2024-03-01,zzz\n" +
      "L2,not_a_number,2024-13-99,zzz\n")
    val loaded = Loader.loadCsv(spark, csv, contract,
      aliases = Map("loan_id" -> "loan_reference"))
    assert(loaded.errors.isEmpty)
    val rows = loaded.df.orderBy("loan_reference").collect()
    assert(loaded.df.columns.toSeq ==
      Seq("loan_reference", "drawn_amount", "is_defaulted", "value_date"))
    assert(rows(0).getDouble(1) == 100.25)
    assert(rows(0).getBoolean(2) == false)          // boolean default
    assert(rows(0).getDate(3).toString == "2024-03-01")
    assert(rows(1).isNullAt(1), "invalid double -> null")
    assert(rows(1).isNullAt(3), "invalid date -> null")
  }

  test("parquet round-trip with missing required column reports DQ001") {
    val dir = Files.createTempDirectory("graft_pq").toString
    Seq((1.0, "x")).toDF("drawn_amount", "extra").write.parquet(s"$dir/t")
    val loaded = Loader.loadParquet(spark, s"$dir/t", contract)
    assert(loaded.errors.map(_.code) == Seq("DQ001"))
    assert(loaded.df.columns.contains("loan_reference"))
    assert(loaded.df.first().isNullAt(0)) // typed-null backfill
  }

  test("audit-cache sink writes frames plus manifest") {
    val dir = Files.createTempDirectory("graft_audit").toString
    Sinks.writeAuditCache(Map(
      "a" -> spark.range(3).toDF(), "b" -> spark.range(5).toDF()), dir)
    val manifest = Files.readString(java.nio.file.Paths.get(s"$dir/manifest.json"))
    assert(manifest.contains("\"a\": 3") && manifest.contains("\"b\": 5"))
    assert(spark.read.parquet(s"$dir/a").count() == 3)
  }
}
