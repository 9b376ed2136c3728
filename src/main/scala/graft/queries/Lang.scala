package graft.queries

import org.apache.spark.sql.functions._

import graft.api.Engine

/** End-to-end AHGHEE language queries: text → parser → StepIR →
  * StepCompiler → DataFrame, oracle-checked against DuckDB running the
  * equivalent SQL on the relational tables (SURVEY.md §3.1; the docs'
  * canonical example shape `get "*" |> filter ... |> skip .. |> take ..`
  * from reference docs/index.md:201-206).
  */
object Lang {

  private def eng(s: org.apache.spark.sql.SparkSession, d: String) =
    Engine.forDir(s, d)

  val registry: Seq[RegQuery] = Seq(

    // ---- a01: scan + filter + paging through the language --------------
    RegQuery("a01_lang_scan_filter",
      (s, d) => eng(s, d)
        .query("""get "*" |> filter "nation" == ^"nation/1" |> skip 5 |> take 10""")
        .select("id").distinct().orderBy("id"),
      Some("""SELECT id FROM (
             |  SELECT 'customer/' || c_custkey AS id FROM customer
             |  WHERE c_nationkey = 1 ORDER BY id LIMIT 10 OFFSET 5)
             |ORDER BY id""".stripMargin)),

    // ---- a02: bounded follow through the language -----------------------
    RegQuery("a02_lang_follow",
      (s, d) => eng(s, d)
        .query("""get "customer/1" |> follow * 0..2""")
        .select("id").distinct().orderBy("id"),
      Some("""SELECT id FROM (
             |SELECT 'customer/1' AS id
             |UNION SELECT 'nation/' || c_nationkey FROM customer WHERE c_custkey = 1
             |UNION SELECT 'region/' || n_regionkey FROM nation
             |  JOIN customer ON n_nationkey = c_nationkey WHERE c_custkey = 1
             |) ORDER BY id""".stripMargin)),

    // ---- a03: fields projection (edges only) through the language ------
    RegQuery("a03_lang_fields",
      (s, d) => eng(s, d)
        .query("""get "customer/1" |> fields *: ^""")
        .select(col("id"), col("key").as("attr_key"),
          col("value.iri").as("value_iri"))
        .orderBy("attr_key"),
      Some("""SELECT 'customer/1' AS id, 'nation' AS attr_key,
             |'nation/' || c_nationkey AS value_iri
             |FROM customer WHERE c_custkey = 1""".stripMargin)),

    // ---- a04: compound boolean filter through the language -------------
    RegQuery("a04_lang_compound",
      (s, d) => eng(s, d)
        .query("""get "*" |> filter ("nation" == ^"nation/1" || "nation" == ^"nation/2") |> take 5""")
        .select("id").distinct().orderBy("id"),
      Some("""SELECT id FROM (
             |  SELECT 'customer/' || c_custkey AS id FROM customer
             |  WHERE c_nationkey IN (1, 2) ORDER BY id LIMIT 5)
             |ORDER BY id""".stripMargin)),

    // ---- a05: put + merge + temporal current view (Engine API) ---------
    RegQuery("a05_put_current",
      (s, d) => {
        val e = eng(s, d)
        // overwrite customer/1's name at a later ts; write a new node
        e.put("""put "customer/1" { "name": "RENAMED" }""", ts = 5L)
        e.put("""put "extra/1" { "kind": "synthetic", "n": 42 }""", ts = 6L)
        e.current
          .where(col("id").isin("customer/1", "extra/1") &&
                 col("key").isin("name", "kind", "n"))
          .select(col("id"), col("key").as("attr_key"),
            coalesce(col("value.str"),
              col("value.i64").cast("string")).as("v"))
          .orderBy("id", "attr_key")
      },
      Some("""SELECT * FROM (
             |SELECT 'customer/1' AS id, 'name' AS attr_key, 'RENAMED' AS v
             |UNION ALL SELECT 'extra/1', 'kind', 'synthetic'
             |UNION ALL SELECT 'extra/1', 'n', '42'
             |) ORDER BY id, attr_key""".stripMargin)),

    // ---- a06: whole-script session — put + load + get through ONE
    // entry point (AHGHEE.g4:5-9: script = command+; the CLI REPL's
    // stream). Mutations apply in order; the final get sees them all.
    RegQuery("a06_script_session",
      (s, d) => {
        val nt = java.nio.file.Files.createTempFile("graft_a06_", ".nt")
        java.nio.file.Files.writeString(nt,
          "<s/3> <name> \"Chloé\"@fr .\n<s/3> <knows> <s/1> .\n")
        val script =
          s"""put "s/1" { "name": "Ada", "age": 36 }
             |put "s/2" { "name": "Bob", "knows": ^"s/1" }
             |load nt "${nt.toString}"
             |get "*"""".stripMargin
        Engine.forEmpty(s).run(script)
          .select(col("id"), col("key").as("attr_key"),
            graft.model.Value.render(col("value")).as("v"),
            col("value_meta.str").as("meta"))
          .orderBy("id", "attr_key")
      },
      Some("""SELECT * FROM (VALUES
             |('s/1', 'age', '36', NULL),
             |('s/1', 'name', 'Ada', NULL),
             |('s/2', 'knows', '^s/1', NULL),
             |('s/2', 'name', 'Bob', NULL),
             |('s/3', 'knows', '^s/1', NULL),
             |('s/3', 'name', 'Chloé', 'lang:@fr')
             |) AS t(id, attr_key, v, meta)
             |ORDER BY id, attr_key""".stripMargin)),

    // ---- a07: numeric inequality through the language ------------------
    // the sniffed literal is an f32 while stored acctbal is a double —
    // the filter must order them on the shared numeric axis, not by
    // vtype tag (the intended-semantics fix for the reference's
    // self-compare bug, FileStore.fs:147 / docs/index.md:202-206)
    RegQuery("a07_lang_inequality",
      (s, d) => eng(s, d)
        .query("""get "*" |> filter "acctbal" > 9000.5 |> take 10""")
        .select("id").distinct().orderBy("id"),
      Some("""SELECT id FROM (
             |  SELECT 'customer/' || c_custkey AS id FROM customer
             |  WHERE c_acctbal > 9000.5 ORDER BY id LIMIT 10)
             |ORDER BY id""".stripMargin))
  )
}
