"""Gopher-style repetition metrics (textstats.repetition_stats_stage)
vs a DuckDB per-doc re-derivation on adversarial inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa


_SQL = """
WITH t AS (SELECT doc_id, COALESCE(text, '') AS text FROM df),
ln AS (SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line FROM t),
lc AS (SELECT doc_id, line, count(*) AS c FROM ln GROUP BY doc_id, line),
ls AS (SELECT doc_id, sum(c) AS n_lines,
       sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
       sum(c * length(line)) AS tot_chars,
       sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dup_chars
       FROM lc GROUP BY doc_id),
w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM t),
wu AS (SELECT doc_id, UNNEST(ws) AS word FROM w),
wc AS (SELECT doc_id, word, count(*) AS c FROM wu GROUP BY doc_id, word),
wstat AS (SELECT doc_id, sum(c) AS n_words, max(c) AS max_wc FROM wc GROUP BY doc_id),
g AS (SELECT doc_id, UNNEST([ws[i] || ' ' || ws[i+1]
      for i in range(1, len(ws))]) AS gram FROM w),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
gstat AS (SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct
          FROM gc GROUP BY doc_id)
SELECT t.doc_id, CAST(ls.n_lines AS BIGINT) AS n_lines,
 CAST(ls.dup_lines AS DOUBLE) / GREATEST(ls.n_lines, 1) AS dup_line_frac,
 CAST(ls.dup_chars AS DOUBLE) / GREATEST(ls.tot_chars, 1) AS dup_line_char_frac,
 CAST(COALESCE(wstat.max_wc, 0) AS DOUBLE)
   / GREATEST(COALESCE(wstat.n_words, 0), 1) AS top_word_frac,
 CAST(COALESCE(gstat.n_grams - gstat.n_distinct, 0) AS DOUBLE)
   / GREATEST(COALESCE(gstat.n_grams, 0), 1) AS dup_2gram_frac
FROM t JOIN ls USING (doc_id) LEFT JOIN wstat USING (doc_id)
LEFT JOIN gstat USING (doc_id) ORDER BY t.doc_id
"""


def _check(df):
    import duckdb

    from hooqu_ray.pipelines.textstats import repetition_stats_stage

    got = (
        repetition_stats_stage(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    exp = duckdb.sql(_SQL).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-12)


class TestRepetitionStats:
    def test_adversarial_docs_match_duckdb(self):
        _check(
            pd.DataFrame(
                {
                    "doc_id": np.arange(8, dtype=np.int64),
                    "text": [
                        "a b a b\na b a b\nunique line of text",
                        None,
                        "",
                        "x x x x y",
                        "single",
                        "line\nline\nline\nline",
                        "tab\tsep words tab\tsep here",
                        "\n\ntrailing\n\n",  # empty lines duplicate
                    ],
                }
            )
        )

    def test_random_corpus_matches_duckdb(self):
        rng = np.random.default_rng(11)
        vocab = np.array(["alpha", "beta", "gamma", "delta", "x"])
        docs = []
        for _ in range(60):
            n_lines = rng.integers(1, 6)
            lines = [
                " ".join(rng.choice(vocab, rng.integers(0, 7)))
                for _ in range(n_lines)
            ]
            # force duplicate lines sometimes
            if n_lines > 2 and rng.random() < 0.5:
                lines[1] = lines[0]
            docs.append("\n".join(lines))
        _check(pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": docs}))

    def test_dataset_wrapper(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.textstats import repetition_stats

        df = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["a a a", "b\nb\nc"]}
        )
        out = (
            repetition_stats(rd.from_pandas(df).repartition(2))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["top_word_frac"].tolist() == [1.0, 2.0 / 3.0]
        assert out["dup_line_frac"].tolist() == [0.0, 2.0 / 3.0]


class TestNormalizeText:
    def test_matches_duckdb_expression(self):
        import duckdb

        from hooqu_ray.pipelines.textstats import normalize_text_stage

        import unicodedata

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "  Hello\t\tWORLD \n x ",
                    None,
                    # DECOMPOSED accents: pins the NFC composition path
                    unicodedata.normalize("NFD", "Café  NAÏVE"),
                    "",
                ],
            }
        )
        got = normalize_text_stage(
            pa.Table.from_pandas(df, preserve_index=False)
        ).column("norm_text").to_pylist()
        exp = duckdb.sql(
            "SELECT trim(regexp_replace(lower(nfc_normalize(text)), "
            "'\\s+', ' ', 'g'), ' ') FROM df ORDER BY doc_id"
        ).df().iloc[:, 0]
        assert got == [None if pd.isna(e) else e for e in exp]


class TestTopTerms:
    def test_matches_duckdb_rank(self, ray_session):
        import duckdb
        import ray.data as rd

        from hooqu_ray.pipelines.textstats import top_terms

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "apple banana apple cherry apple",
                    "banana banana cherry",
                    None,
                    "zeta zeta alpha alpha",  # tf tie → df then term breaks
                ],
            }
        )
        got = (
            top_terms(rd.from_pandas(df).repartition(2), k=2)
            .to_pandas()
            .sort_values(
                ["doc_id", "tf", "df", "term"],
                ascending=[True, False, True, True], ignore_index=True,
            )
        )
        exp = duckdb.sql(
            "WITH t AS (SELECT doc_id, COALESCE(text, '') AS text FROM df), "
            "wu AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM t), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM wu GROUP BY doc_id, term), "
            "dfq AS (SELECT term, count(*) AS df FROM "
            "(SELECT DISTINCT doc_id, term FROM wu) GROUP BY term), "
            "r AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rn "
            "FROM tf JOIN dfq USING (term)) "
            "SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df "
            "FROM r WHERE rn <= 2 ORDER BY doc_id, tf DESC, df, term"
        ).df()
        pd.testing.assert_frame_equal(
            got[["doc_id", "term", "tf", "df"]], exp, check_dtype=False
        )

    def test_doc_frequency_counts_docs_not_tokens(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.textstats import doc_frequency

        df = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["dup dup dup", "dup once"]}
        )
        out = (
            doc_frequency(rd.from_pandas(df).repartition(2))
            .to_pandas()
            .sort_values("term", ignore_index=True)
        )
        assert out.values.tolist() == [["dup", 2], ["once", 1]]


class TestVocabStats:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from hooqu_ray.pipelines.textstats import vocab_stats

        rows = [
            ("web", "the cat sat on the mat"),       # 'the' twice
            ("web", "a cat ran"),
            ("books", "lorem ipsum lorem"),
            ("books", ""),                            # empty text: no tokens
            ("empty_src", "   "),                     # whitespace-only: absent
            (None, "dropped tokens here"),            # null group dropped
        ]
        t = pa.table({
            "source": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
        got = vocab_stats(
            rd.from_arrow(t).repartition(3), "text", "source"
        ).to_pandas().sort_values("source", ignore_index=True)

        con = duckdb.connect()
        con.register("docs", t)
        want = con.execute(
            "WITH tok AS (SELECT source, UNNEST(regexp_extract_all("
            "COALESCE(text, ''), '\\S+')) AS tk FROM docs "
            "WHERE source IS NOT NULL), "
            "c AS (SELECT source, tk, count(*) AS n FROM tok GROUP BY source, tk) "
            "SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(*) AS BIGINT) AS n_types, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, "
            "ROUND(COUNT(*) / CAST(SUM(n) AS DOUBLE), 6) AS type_token_ratio, "
            "ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) / "
            "CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio "
            "FROM c GROUP BY source ORDER BY source"
        ).df().reset_index(drop=True)
        got["type_token_ratio"] = got["type_token_ratio"].round(6)
        got["hapax_ratio"] = got["hapax_ratio"].round(6)
        assert got[want.columns.tolist()].equals(want)
        assert set(got["source"]) == {"web", "books"}

    def test_split_across_blocks_hapax_correct(self, ray_session):
        # a token appearing once in each of two blocks is NOT a hapax —
        # only the cross-block fold can know that
        import pyarrow as pa
        import ray.data as rd

        from hooqu_ray.pipelines.textstats import vocab_stats

        t = pa.table({
            "source": pa.array(["s"] * 4, pa.string()),
            "text": pa.array(["alpha beta", "alpha gamma",
                              "delta", "epsilon"], pa.string()),
        })
        got = vocab_stats(
            rd.from_arrow(t).repartition(4), "text", "source"
        ).to_pandas()
        assert got["n_tokens"].tolist() == [6]
        assert got["n_types"].tolist() == [5]
        assert got["n_hapax"].tolist() == [4]  # alpha (x2) is not hapax


class TestInvertedIndex:
    def test_postings_capped_and_ranked(self, ray_session):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from hooqu_ray.pipelines.textstats import inverted_index

        t = pa.table({
            "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
            "text": pa.array([
                "the cat", "the the dog", "the fish", "bird",
            ], pa.string()),
        })
        got = inverted_index(
            rd.from_arrow(t).repartition(3), "text", "doc_id",
            max_postings=2,
        ).to_pandas().sort_values(["term", "rank"], ignore_index=True)
        con = duckdb.connect()
        con.register("docs", t)
        want = con.execute(
            "WITH tok AS (SELECT DISTINCT doc_id, UNNEST("
            "regexp_extract_all(COALESCE(text, ''), '\\S+')) AS term "
            "FROM docs), "
            "r AS (SELECT term, doc_id, row_number() OVER (PARTITION BY "
            "term ORDER BY doc_id) AS rank FROM tok) "
            "SELECT term, CAST(rank AS BIGINT) AS rank, "
            "CAST(doc_id AS BIGINT) AS doc_id FROM r WHERE rank <= 2 "
            "ORDER BY term, rank"
        ).df().reset_index(drop=True)
        assert got[want.columns.tolist()].equals(want)
        # 'the' appears in docs 1,2,3 — capped at 2 postings (1, 2)
        the = got[got.term == "the"]
        assert the["doc_id"].tolist() == [1, 2]


class TestBM25Scores:
    _SQL = """
WITH t AS (SELECT doc_id, COALESCE(text, '') AS text FROM df),
wu AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM t),
dl AS (SELECT doc_id, count(*) AS dl FROM wu GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM t) AS n,
       (SELECT count(*) FROM wu) * 1.0 / (SELECT count(*) FROM t) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM wu WHERE term IN ({terms})
       GROUP BY doc_id, term),
dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM wu
        WHERE term IN ({terms}) GROUP BY term)
SELECT tf.doc_id,
  SUM( ln(1 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5))
     * (tf.tf * ({k1} + 1)) / (tf.tf + {k1} * (1 - {b} + {b} * (dl.dl / st.avgdl))) )
  AS score
FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id), st
GROUP BY tf.doc_id ORDER BY tf.doc_id"""

    def test_matches_duckdb_closed_form(self, ray_session):
        import duckdb
        import ray.data as rd
        from hooqu_ray.pipelines.textstats import bm25_scores

        rng = np.random.RandomState(13)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        df = pd.DataFrame({
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, rng.randint(1, 40)))
                     for _ in range(300)],
        })
        df.loc[7, "text"] = None       # null text counts toward N/avgdl
        df.loc[11, "text"] = "   "     # empty-token doc too
        got = bm25_scores(rd.from_pandas(df).repartition(5),
                          "alpha gamma zeta").to_pandas() \
            .sort_values("doc_id", ignore_index=True)
        sql = self._SQL.format(terms="'alpha','gamma','zeta'",
                               k1=1.2, b=0.75)
        exp = duckdb.sql(sql).df()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert np.allclose(got["score"].to_numpy(), exp["score"].to_numpy(),
                           atol=1e-9)

    def test_no_match_term_and_params(self, ray_session):
        import duckdb
        import ray.data as rd
        from hooqu_ray.pipelines.textstats import bm25_scores

        df = pd.DataFrame({"doc_id": [0, 1, 2],
                           "text": ["a b a", "b c", "c c c"]})
        # 'zzz' matches nothing; non-default k1/b
        got = bm25_scores(rd.from_pandas(df), "a zzz", k1=0.9, b=0.4) \
            .to_pandas().sort_values("doc_id", ignore_index=True)
        sql = self._SQL.format(terms="'a','zzz'", k1=0.9, b=0.4)
        exp = duckdb.sql(sql).df()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist() == [0]
        assert np.allclose(got["score"].to_numpy(), exp["score"].to_numpy())

    def test_empty_inputs(self, ray_session):
        import pytest
        import ray.data as rd
        from hooqu_ray.pipelines.textstats import bm25_scores

        e = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
        out = bm25_scores(e, "a b")
        assert out.schema().names == ["doc_id", "score"]
        assert out.count() == 0
        with pytest.raises(ValueError):
            bm25_scores(e, "   ")


class TestBM25Multi:
    def test_multi_equals_per_query_runs(self, ray_session):
        import ray.data as rd
        from hooqu_ray.pipelines.textstats import bm25_scores, bm25_scores_multi

        rng = np.random.RandomState(17)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
        df = pd.DataFrame({
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, rng.randint(1, 30)))
                     for _ in range(200)],
        })
        ds = rd.from_pandas(df).repartition(5)
        queries = {"a": "alpha beta", "b": "gamma", "c": "delta epsilon beta"}
        multi = bm25_scores_multi(ds, queries).to_pandas()
        for qid, qs in queries.items():
            single = bm25_scores(ds, qs).to_pandas() \
                .sort_values("doc_id", ignore_index=True)
            part = multi[multi["query_id"] == qid] \
                .drop(columns=["query_id"]).sort_values(
                "doc_id", ignore_index=True)
            pd.testing.assert_frame_equal(part, single)

    def test_validation_and_empty(self, ray_session):
        import ray.data as rd
        from hooqu_ray.pipelines.textstats import bm25_scores_multi

        e = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
        out = bm25_scores_multi(e, {"q": "x"})
        assert out.schema().names == ["query_id", "doc_id", "score"]
        assert out.count() == 0
        import pytest
        with pytest.raises(ValueError):
            bm25_scores_multi(e, {})
        with pytest.raises(ValueError):
            bm25_scores_multi(e, {"q": "  "})


class TestBM25NoMatchAnchor:
    def test_query_absent_from_corpus_keeps_schema(self, ray_session):
        import ray.data as rd
        from hooqu_ray.pipelines.textstats import bm25_scores, bm25_scores_multi

        df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                           "text": ["common words only"] * 50})
        ds = rd.from_pandas(df).repartition(3)
        multi = bm25_scores_multi(ds, {"q": "zzz_not_in_corpus"})
        assert multi.count() == 0
        assert multi.schema().names == ["query_id", "doc_id", "score"]
        single = bm25_scores(ds, "zzz_not_in_corpus")
        assert single.count() == 0
        assert single.schema().names == ["doc_id", "score"]
