package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must expose every kernel to plain SQL in a session
  * built only from conf — the cluster-deployment path. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes every kernel to plain SQL") {
    // the shared test session already exists, so apply the extension
    // installer to it directly (same registrations spark.sql.extensions
    // would perform at build time)
    val spark = TestSession.spark
    org.apache.spark.sql.GraftBridge.applyFunctionExtensions(spark, new GraftExtensions)
    locally {
      val row = spark.sql(
        """SELECT time_text_to_micros('01:02:03.000004') AS us,
          |  timestamp_tz_to_micros('2022-09-07 16:04:12 +02:00') AS tz,
          |  micros_of_day_to_text(3723000004) AS txt,
          |  fnv64('') AS h,
          |  dot_product(array(CAST(1.5 AS DOUBLE), 2.0), array(CAST(2.0 AS DOUBLE), 3.0)) AS dp,
          |  simhash64(array('a','b')) AS sh
          |""".stripMargin).collect().head
      assert(row.getLong(0) == 3723000004L)
      assert(row.getLong(1) ==
        java.time.Instant.parse("2022-09-07T14:04:12Z").getEpochSecond * 1000000L)
      assert(row.getString(2) == "01:02:03.000004")
      assert(row.getLong(3) == 0xcbf29ce484222325L)
      assert(row.getDouble(4) == 9.0)
      row.getLong(5) // simhash evaluates
    }
    locally {
      // NFC kernel: decomposed e+U+0301 composes to U+00E9; already-NFC
      // input is identity; non-BMP passthrough (astral chars unmangled).
      // spellings via scala escapes so no tool can normalize this file
      val row = spark.sql(
        "SELECT nfc_normalize('cafe\u0301') AS a, " +
          "nfc_normalize('caf\u00e9') AS b, " +
          "nfc_normalize('x\ud83d\ude00y') AS c").collect().head
      assert(row.getString(0) == "caf\u00e9")
      assert(row.getString(1) == "caf\u00e9")
      assert(row.getString(2) == "x\ud83d\ude00y")
    }
    locally {
      val row = spark.sql(
        """SELECT zorder2(1, 2) AS z,
          |  sq8_adc_dot(array(CAST(2.0 AS FLOAT)), array(CAST(-128 AS TINYINT)),
          |    array(CAST(0.5 AS DOUBLE)), array(CAST(0.0 AS DOUBLE))) AS adc,
          |  pq_lut_score(
          |    pq_lut(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |      array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE),
          |            CAST(5.0 AS DOUBLE), CAST(6.0 AS DOUBLE)), 2, 2),
          |    array(CAST(1 AS TINYINT)), 2) AS pq
          |""".stripMargin).collect().head
      // zorder2(0b01, 0b10) interleaves to 0b0110 = 6
      assert(row.getLong(0) == 6L)
      // code −128 → level 0 → dequantizes to lo=0.5; 2.0 · 0.5 = 1.0
      assert(row.getDouble(1) == 1.0)
      // one subspace (m=0), code 1 → centroid (5,6): 1·5 + 2·6 = 17
      assert(row.getDouble(2) == 17.0)
    }
    locally {
      val row = spark.sql(
        """SELECT jaccard_sorted(array(1L, 3L), array(3L, 5L)) AS j,
          |  intersect_count_sorted(array(1L, 3L, 9L), array(3L, 9L, 11L)) AS ic,
          |  intersect_sorted(array(1L, 3L, 9L), array(3L, 9L, 11L)) AS is
          |""".stripMargin).collect().head
      assert(row.getDouble(0) == 1.0 / 3.0)
      assert(row.getLong(1) == 2L)
      assert(row.getSeq[Long](2).toList == List(3L, 9L))
    }
  }
}
