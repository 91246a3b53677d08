import duckdb
import pandas as pd
import pytest

from open_thoughts_ray.ops.boilerplate import (
    doc_lines,
    frequent_line_hashes,
    remove_boilerplate_lines,
)


def _corpus():
    """Docs sharing a 6-token boilerplate window plus unique tails."""
    boiler = "subscribe to our newsletter today now"
    rows = []
    for i in range(8):
        uniq = " ".join(f"tok{i}x{j}" for j in range(6))
        rows.append((i, boiler + " " + uniq))
    rows.append((8, boiler))                 # all-boilerplate doc
    rows.append((9, "completely unique text here for doc nine"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _oracle(df, k=6, min_df=2):
    con = duckdb.connect()
    con.register("documents", df)
    return con.sql(f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        l AS (SELECT doc_id, i, array_to_string(
                     list_slice(toks, (i-1)*{k}+1, (i-1)*{k}+{k}), ' ') AS line
              FROM t, UNNEST(generate_series(
                     1, CAST(ceil(len(toks)/{k}.0) AS BIGINT))) AS u(i)),
        f AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS df
                                FROM l GROUP BY line) WHERE df >= {min_df}),
        kk AS (SELECT doc_id, i, line FROM l
               WHERE line NOT IN (SELECT line FROM f))
        SELECT d.doc_id,
               coalesce(string_agg(kk.line, ' ' ORDER BY kk.i), '') AS clean_text
        FROM documents d LEFT JOIN kk ON d.doc_id = kk.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id
    """).fetchdf()


def test_doc_lines_windows_and_newlines():
    assert doc_lines("a b c d e f g", 3) == ["a b c", "d e f", "g"]
    assert doc_lines("", 3) == [""]
    assert doc_lines("x\ny z", None) == ["x", "y z"]


def test_boilerplate_matches_oracle_small_path(ray_session):
    import ray.data as rd

    df = _corpus()
    got = (remove_boilerplate_lines(rd.from_pandas(df), min_df=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _oracle(df)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the shared window is gone, unique tails survive, doc 8 is emptied
    assert got.loc[8, "clean_text"] == ""
    assert got.loc[0, "clean_text"].startswith("tok0x0")


def test_boilerplate_distributed_path_equals_small(ray_session):
    import ray.data as rd

    df = _corpus()
    small = (remove_boilerplate_lines(rd.from_pandas(df), min_df=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (remove_boilerplate_lines(rd.from_pandas(df), min_df=2,
                                     max_driver_lines=0, num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(small, dist, check_dtype=False)


def test_boilerplate_newline_mode(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["keep me\nCOOKIE NOTICE\nreal content",
                 "COOKIE NOTICE\nother words",
                 "standalone document"],
    })
    got = (remove_boilerplate_lines(rd.from_pandas(df), line_tokens=None,
                                    min_df=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "clean_text"] == "keep me\nreal content"
    assert got.loc[1, "clean_text"] == "other words"
    assert got.loc[2, "clean_text"] == "standalone document"


def test_no_frequent_lines_is_identity(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["alpha beta gamma", "delta epsilon zeta"]})
    got = (remove_boilerplate_lines(rd.from_pandas(df), min_df=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["clean_text"].tolist() == df["text"].tolist()


def test_frequent_line_hashes_counts_distinct_docs(ray_session):
    import ray.data as rd

    # line repeated WITHIN one doc only → df 1 → not frequent
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["a b c d e f a b c d e f",
                                "g h i j k l m n o p q r"]})
    freq = frequent_line_hashes(rd.from_pandas(df), min_df=2).to_pandas()
    assert len(freq) == 0


def test_dedup_lines_within_doc(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.boilerplate import dedup_lines_within_doc

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c d e f a b c d e f g h i j k l",  # window 1 == window 0
                 "unique one two three four five"],
    })
    got = (dedup_lines_within_doc(rd.from_pandas(df), line_tokens=6)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "dedup_text"] == "a b c d e f g h i j k l"
    assert got.loc[1, "dedup_text"] == df.loc[1, "text"]
    # newline mode keeps first occurrence in order
    df2 = pd.DataFrame({"doc_id": [0], "text": ["x\ny\nx\nz"]})
    got2 = dedup_lines_within_doc(rd.from_pandas(df2),
                                  line_tokens=None).to_pandas()
    assert got2.loc[0, "dedup_text"] == "x\ny\nz"
