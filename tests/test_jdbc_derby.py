"""S5 executable evidence: ``read_jdbc`` runs end-to-end against an
embedded Derby database (the JDBC driver Spark ships for its metastore),
not just the option-plumbing shape — including the pushdown-bearing
``query`` form."""

from __future__ import annotations


def _populate(spark, url: str) -> None:
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE metrics (id INT, name VARCHAR(20), val DOUBLE)"
    )
    for i in range(10):
        st.executeUpdate(f"INSERT INTO metrics VALUES ({i}, 'n{i}', {i * 1.5})")
    st.close()
    conn.close()


def test_read_jdbc_embedded_derby(spark, tmp_path):
    from magi_etl_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/warehouse_db"
    _populate(spark, url)

    df = read_jdbc(
        spark,
        url,
        "SELECT id, name, val FROM metrics WHERE id >= 5",
        properties={"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
    )
    got = sorted((r[0], r[1], r[2]) for r in df.collect())
    assert got == [(i, f"n{i}", i * 1.5) for i in range(5, 10)]
    # schema came from the database, not inference
    assert [t for _, t in df.dtypes] == ["int", "string", "double"]
