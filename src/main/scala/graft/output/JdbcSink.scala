package graft.output

import org.apache.spark.sql.DataFrame

/** JDBC sink (SURVEY.md §2.1 S7 — the reference's `df.to_sql` SQLite
  * export). `df.write.jdbc` into an embedded database and read back
  * through the same JDBCRelation; on a cluster the url swaps for
  * Postgres/MySQL with identical plan shape (column-pruned JDBC scan,
  * predicate pushdown into the remote SQL).
  *
  * The driver-facing query uses Derby, which ships inside the Spark
  * distribution itself — the sink is exercisable on any Spark classpath
  * with no extra jar (DuckDB JDBC remains the test-scope variant).
  */
object JdbcSink {

  locally { // keep Derby's log out of the process cwd
    System.setProperty("derby.stream.error.file", "target/derby.log")
  }

  /** Overwrite-write `df` to `table` at `url`, read it back. */
  def roundTrip(
      df: DataFrame,
      url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties()
  ): DataFrame = {
    df.write.mode("overwrite").jdbc(url, table, props)
    df.sparkSession.read.jdbc(url, table, props)
  }
}
