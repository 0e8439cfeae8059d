"""Round-5 pins: k-core convergence + multigraph hygiene, debounce
schema derivation, PNG truncated-chunk contract (r4 ADVICE items)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- k-core


def test_kcore_multigraph_input_does_not_inflate_degrees(spark):
    """Duplicate edges and self-loops must not count toward degree —
    node 4 has one real neighbor (3×-duplicated edge) plus a self-loop;
    under the old COUNT(*) it would look degree-5 and survive k=2."""
    from data_quality_checks_in_relational_database_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3),            # triangle: the true 2-core
         (3, 4), (3, 4), (4, 3),            # duplicated pendant edge
         (4, 4), (4, 4)],                   # self-loops
        "src long, dst long",
    )
    rows = {r["node"]: r for r in kcore_peel(edges, k=2, rounds=4).collect()}
    assert {n for n, r in rows.items() if r["in_kcore"]} == {1, 2, 3}
    assert rows[4]["in_kcore"] is False and rows[4]["core_degree"] == 0


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_kcore_boilerplate_converges_at_shipped_sfs(spark, sf_dir):
    """``in_kcore`` means "survived ``rounds`` peels" — this asserts the
    registered round budget has actually converged at every shipped SF
    (rounds and rounds+1 produce identical membership), so the unrolled
    oracle's inability to see under-peeling is moot on shipped data."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from data_quality_checks_in_relational_database_spark.operators.graph import kcore_peel
    from data_quality_checks_in_relational_database_spark.plans.graph_queries import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # checkpoint the (expensive) pair source once; peel twice from it
    pairs = minhash_lsh_pairs(docs, threshold=0.5).localCheckpoint()

    def membership(rounds):
        return {
            (r["node"], r["core_degree"], r["in_kcore"])
            for r in kcore_peel(
                pairs, k=_KCORE_K, rounds=rounds, src="doc_id_a", dst="doc_id_b"
            ).collect()
        }

    at_budget = membership(_KCORE_ROUNDS)
    assert at_budget == membership(_KCORE_ROUNDS + 1)
    # non-vacuous: some survivors AND some peeled nodes exist
    assert any(r[2] for r in at_budget)
    assert any(not r[2] for r in at_budget)


# ----------------------------------------------------------- debounce


def test_debounce_events_derives_schema_from_input(spark):
    """String event ids + int user keys must round-trip — the output
    schema is derived from the input columns, not hardcoded."""
    from data_quality_checks_in_relational_database_spark.operators.funnel import (
        debounce_events,
    )

    events = spark.createDataFrame(
        [
            ("e1", 7, "click", "2024-01-01 00:00:00"),
            ("e2", 7, "click", "2024-01-01 00:00:03"),
            ("e3", 7, "click", "2024-01-01 00:00:20"),
            ("e4", 8, "view", "2024-01-01 00:00:00"),
        ],
        "event_id string, user_id int, event_type string, ts string",
    )
    out = debounce_events(
        events, gap_seconds=10, id_col="event_id", user_col="user_id",
        type_col="event_type", ts_col="ts",
    )
    assert dict(out.dtypes)["event_id"] == "string"
    assert dict(out.dtypes)["user_id"] == "int"
    kept = {r["event_id"]: r["kept"] for r in out.collect()}
    assert kept == {"e1": True, "e2": False, "e3": True, "e4": True}


# ---------------------------------------------------------------- PNG


def test_decode_png_truncated_chunk_raises_value_error():
    """A chunk whose declared length runs past the payload end must hit
    the documented ValueError contract, not struct.error."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        _build_png_codec,
    )

    encode_png_gray, decode_png = _build_png_codec()
    good = encode_png_gray([[10, 20, 30, 40], [50, 60, 70, 80], [90, 100, 110, 120]])
    # cut IEND (12 bytes) plus 1 byte of IDAT's CRC: IDAT's declared
    # length now extends past the payload end
    truncated = good[: len(good) - 13]
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(truncated)
    # and a declared length beyond the end inside a middle chunk
    import struct

    blown = bytearray(good)
    # IHDR length field sits at offset 8; inflate it past payload end
    blown[8:12] = struct.pack(">I", len(good))
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(bytes(blown))
