"""Block-model fidelity: Relationships graph + CELL indices (SURVEY §1.3).

Mirrors the reference's Textract block model: parent→child id adjacency
(consumed at strikethrough_agent.py:194-205) and CELL RowIndex/ColumnIndex/
Span/EntityTypes fields (full_response_output.json)."""

import pyspark.sql.functions as F
import pytest

from ocr_machine_spark.core.extract import extract_one
from ocr_machine_spark.operators.extraction import extract_blocks
from ocr_machine_spark.sources.pages import generate_pages


def test_cell_indices_pure():
    html = (
        b"<table><tr><th>A</th><th colspan='2'>B</th></tr>"
        b"<tr><td>x</td><td>y</td><td>z</td></tr></table>"
    )
    r = extract_one(html, want_blocks=True)
    cells = [b for b in r.blocks if b["block_type"] in ("CELL",)]
    assert [(c["row_idx"], c["col_idx"]) for c in cells] == [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)]
    assert cells[1]["col_span"] == 2
    assert cells[0]["entity_types"] == ["COLUMN_HEADER"]
    assert cells[2]["entity_types"] == []


def test_parent_child_graph_pure():
    html = b"<ul><li>item one here now ok</li><li>item two here now ok</li></ul><p>top level paragraph text here</p>"
    r = extract_one(html, want_blocks=True)
    by_seq = {b["seq"]: b for b in r.blocks}
    for b in r.blocks:
        for c in b["child_seqs"]:
            assert by_seq[c]["parent_seq"] == b["seq"]
        if b["parent_seq"] is not None:
            assert b["seq"] in by_seq[b["parent_seq"]]["child_seqs"]


def test_reassemble_matches_extraction(spark):
    """Grouped-map reassembly agrees with the single-pass extraction —
    the recombine-vs-never-split equivalence (SURVEY §2.7 T2)."""
    from ocr_machine_spark.operators.extraction import extract_pages, reassemble_documents

    pages = generate_pages(spark, 100, partitions=4)
    re_df = reassemble_documents(extract_blocks(pages)).select(
        "url", F.col("n_content_blocks").alias("re_n")
    )
    direct = extract_pages(pages).select("url", "n_content_blocks")
    j = direct.join(re_df, "url")
    assert j.count() == 100
    assert j.filter(F.col("re_n") != F.col("n_content_blocks")).count() == 0


@pytest.mark.usefixtures("spark")
def test_blocks_relationships_spark(spark):
    pages = generate_pages(spark, 80, partitions=4)
    blocks = extract_blocks(pages).cache()
    # referential integrity: every child_id and parent_id resolves
    ids = blocks.select("url", F.col("block_id").alias("ref"))
    children = blocks.select("url", F.explode("child_ids").alias("ref"))
    parents = blocks.filter(F.col("parent_id").isNotNull()).select("url", F.col("parent_id").alias("ref"))
    assert children.join(ids, ["url", "ref"], "left_anti").count() == 0
    assert parents.join(ids, ["url", "ref"], "left_anti").count() == 0
    # CELL rows carry indices; non-cells don't
    cells = blocks.filter(F.col("block_type") == "CELL")
    assert cells.count() > 0
    assert cells.filter(F.col("row_idx").isNull() | F.col("col_idx").isNull()).count() == 0
    assert blocks.filter((F.col("block_type") != "CELL") & F.col("row_idx").isNotNull()).count() == 0
    # header cells labeled like the reference fixture
    assert cells.filter(F.array_contains("entity_types", "COLUMN_HEADER")).count() > 0
