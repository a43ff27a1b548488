package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the CROSS-ENGINE arithmetic invariants every integer-grid oracle
  * construction rests on, against the REAL DuckDB on the test classpath —
  * the contract the q103-family and q203's doremiSql cite. If a
  * duckdb_jdbc upgrade ever changes `//` to floor division or drifts
  * `ln`/double formatting, this fails by NAME instead of surfacing as a
  * confusing hash mismatch in some downstream query gate. No Spark
  * session needed — this is pure JDBC vs JVM arithmetic. */
class OracleSemanticsSpec extends AnyFunSuite {

  private def duck[A](f: java.sql.Statement => A): A = {
    val conn = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      try f(st) finally st.close()
    } finally conn.close()
  }

  test("DuckDB // equals Scala Long / — truncation toward zero, including negative dividends") {
    val cases = Seq((-7L, 2L), (7L, 2L), (-7L, -2L), (7L, -2L),
      (-1L, 3L), (1L, 3L), (-1048577L, 1048576L), (Long.MinValue + 1, 3L))
    duck { st =>
      cases.foreach { case (a, b) =>
        val rs = st.executeQuery(s"SELECT ($a::BIGINT) // ($b::BIGINT)")
        rs.next()
        assert(rs.getLong(1) == a / b,
          s"$a // $b: duckdb ${rs.getLong(1)} vs scala ${a / b} — the " +
            "truncating-division contract the grid oracles (q203 " +
            "doremiSql, q205, the div-based operators) rest on is broken")
        rs.close()
      }
    }
  }

  test("floor(ln(n)·2^20) matches JVM Math.log on exact-integer inputs across the oracle range") {
    // the q103 idiom: ln runs ONLY on exact integers; sample the range the
    // oracles actually use — counts (1..~1e7) through q203's mixture
    // numerators (up to ~2^48, still exact in double)
    val g = 1048576L
    val samples = Seq(1L, 2L, 3L, 7L, 12345L, 999983L, 10000019L,
      (1L << 31) + 12345L, (1L << 40) + 987654321L, (1L << 48) - 1L)
    duck { st =>
      samples.foreach { n =>
        val rs = st.executeQuery(
          s"SELECT cast(floor(ln(($n::BIGINT)::DOUBLE) * $g) as bigint)")
        rs.next()
        val want = math.floor(math.log(n.toDouble) * g.toDouble).toLong
        assert(rs.getLong(1) == want,
          s"floor(ln($n)*2^20): duckdb ${rs.getLong(1)} vs jvm $want — " +
            "the quantized-log grid diverged between engines")
        rs.close()
      }
    }
  }

  test("e-notation double literals round-trip Scala Double.toString exactly (the DECIMAL-parse trap stays closed)") {
    // a bare numeric literal parses as DECIMAL in DuckDB and loses a ulp
    // through the decimal->double mantissa division; e-notation parses as
    // DOUBLE directly (the round-15 finding the float-emitting oracles
    // rely on)
    val vals = Seq(3.02, 1.0 / 3.0, math.Pi, 2.553343794264498e-2)
    duck { st =>
      vals.foreach { v =>
        val lit = {
          val s = v.toString
          if (s.contains('e') || s.contains('E')) s else s + "e0"
        }
        val rs = st.executeQuery(s"SELECT $lit")
        rs.next()
        assert(rs.getDouble(1) == v,
          s"e-notation $lit: duckdb ${rs.getDouble(1)} != scala $v")
        rs.close()
      }
    }
  }
}
