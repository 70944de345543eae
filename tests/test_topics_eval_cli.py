"""TREC tagged-topic parsing (TRECQuery.java semantics), named-page
evaluation goldens (NamedPageEvaluation.java), and the interactive /
--topics-format CLI surfaces driven as real subprocesses."""

import os
import subprocess
import sys
import textwrap

import pandas as pd
import pytest

from terrier_spark.query.evaluation import evaluate_named_page, parse_qrels
from terrier_spark.query.topics import (
    load_single_line_topics,
    parse_trec_topics,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLASSIC = textwrap.dedent("""\
    <top>
    <num> Number: 301
    <title> International Organized Crime

    <desc> Description:
    Identify organizations that participate in international criminal
    activity.

    <narr> Narrative:
    A relevant document must describe such an organization.
    </top>

    <top>
    <num> Number: 302
    <title>
    Poliomyelitis and Post-Polio

    <desc> Description:
    Is the disease of Poliomyelitis under control?
    </top>
""")


def test_parse_classic_title_only():
    topics = parse_trec_topics(CLASSIC)
    assert topics == [
        ("301", "International Organized Crime"),
        ("302", "Poliomyelitis and Post-Polio"),
    ]


def test_parse_with_desc_strips_name_token():
    topics = parse_trec_topics(CLASSIC, fields=("title", "desc"))
    assert topics[0][0] == "301"
    text = topics[0][1]
    assert text.startswith("International Organized Crime Identify")
    assert "Description" not in text


def test_parse_closed_tags_and_case():
    text = """<TOP><NUM>Number: 51</NUM><TITLE>airbus subsidies</TITLE>
    <DESC>Description: document will discuss</DESC></TOP>"""
    assert parse_trec_topics(text) == [("51", "airbus subsidies")]
    assert parse_trec_topics(text, fields=("desc",)) == [
        ("51", "document will discuss")
    ]


def test_parse_skips_empty_title_topic():
    text = "<top><num>1</num><title></title></top>" \
           "<top><num>2</num><title>kept</title></top>"
    assert parse_trec_topics(text) == [("2", "kept")]


def test_parse_missing_num_raises():
    with pytest.raises(ValueError):
        parse_trec_topics("<top><title>no id</title></top>")


def test_single_line_topics(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("1 alpha beta\n\n2 gamma\n")
    assert load_single_line_topics(str(p)) == [
        ("1", "alpha beta"), ("2", "gamma")
    ]


# ---------------------------------------------------------------------------
# named-page evaluation goldens (hand-computed)


def test_named_page_goldens():
    results = pd.DataFrame(
        [
            # q1: answer at rank 0 (1-based rank 1) -> RR 1.0
            ("1", 0, "d1"), ("1", 1, "d2"),
            # q2: answer at 1-based rank 4 -> RR 0.25
            ("2", 0, "x"), ("2", 1, "y"), ("2", 2, "z"), ("2", 3, "d9"),
            # q3: answer never retrieved -> not found
            ("3", 0, "a"), ("3", 1, "b"),
            # q4: unjudged -> skipped entirely
            ("4", 0, "w"),
        ],
        columns=["qid", "rank", "docno"],
    )
    qrels = parse_qrels([
        "1 0 d1 1", "2 0 d9 1", "3 0 notthere 1",
    ])
    out = evaluate_named_page(results, qrels)
    assert out["num_queries"] == 3
    assert out["ARR"] == pytest.approx((1.0 + 0.25 + 0.0) / 3)
    assert out["recip_rank_per_query"] == {"1": 1.0, "2": 0.25}
    assert out["in_top"][1] == pytest.approx(1 / 3)
    assert out["in_top"][5] == pytest.approx(2 / 3)
    assert out["not_in_top50"] == pytest.approx(1 / 3)


def test_named_page_cutoff():
    rows = [("1", r, f"d{r}") for r in range(60)]
    results = pd.DataFrame(rows, columns=["qid", "rank", "docno"])
    qrels = {"1": {"d55"}}  # 1-based rank 56 > cutoff 50
    out = evaluate_named_page(results, qrels)
    assert out["ARR"] == 0.0
    assert out["not_in_top50"] == 1.0
    # the reference counts it found-at-rank but not within the measure
    assert out["first_rank_per_query"]["1"] == 56


# ---------------------------------------------------------------------------
# CLI surfaces (real subprocesses over a real index)


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from terrier_spark.config import IndexConfig
    from terrier_spark.index.builder import build_index
    from terrier_spark.index.corpus import synth_source_corpus

    out = str(tmp_path_factory.mktemp("cli_idx"))
    corpus = synth_source_corpus(spark, n_docs=120)
    build_index(spark, corpus, out, IndexConfig(), bucket_span=128)
    return out


def _run_cli(args, stdin_text=None, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "terrier_spark", *args],
        input=stdin_text, capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


def test_cli_search_trec_topics(small_index, tmp_path):
    topics = tmp_path / "topics.sgml"
    topics.write_text(
        "<top><num> Number: 7 </num>"
        "<title> sym1 return class </title></top>"
    )
    proc = _run_cli([
        "search", "--index", small_index, "--queries", str(topics),
        "--topics-format", "trec", "--k", "5", "--keep-low-idf",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("7 Q0 ")]
    assert len(lines) == 5
    parts = lines[0].split()
    assert parts[3] == "0" and parts[5] == "terrier_spark"


def test_cli_interactive_loop(small_index):
    proc = _run_cli(
        ["interactive", "--index", small_index, "--k", "3",
         "--keep-low-idf"],
        stdin_text="sym1 return\n\nquit\n",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "interactive querying" in out
    assert "Displaying 1-3 results" in out
    # three decorated hit lines: rank docno score
    hits = [ln for ln in out.splitlines()
            if ln and ln[0].isdigit() and len(ln.split()) == 3]
    assert len(hits) == 3
    assert hits[0].split()[0] == "0"
