"""SemanticIndex behavior tests — reference-semantics parity (SURVEY.md §5.2,
FIXTURES.md §A): the Preview smoke scenario, the 4 duplicate policies,
remove-all semantics, persistence round-trip."""

import math

import pytest

from semantic_index_spark.duplicate_handling import DuplicateHandling, DuplicateItemError
from semantic_index_spark.embedder import DeterministicEmbedder
from semantic_index_spark.index import SemanticIndex, canonical_json

ITEMS = ["cat", "dog", "fish", "apple", "banana", "orange"]  # Program.cs:7-17


@pytest.fixture()
def index(spark):
    idx = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=64))
    idx.add_range(ITEMS)
    return idx


def test_count_and_contains(index):
    # Count: SemanticDatabase.cs:110-125; Contains: :228-242
    assert index.count() == 6
    assert index.contains("cat")
    assert not index.contains("zebra")


def test_get_all_projection(index):
    # GetAll projects items only: SemanticDatabase.cs:248-260
    assert sorted(index.get_all()) == sorted(ITEMS)


def test_preview_smoke_roundtrip(index, tmp_path):
    # Program.cs:18-29: save, reload, search k=3 descending.
    path = str(tmp_path / "idx.parquet")
    index.save(path)
    loaded = SemanticIndex.from_file(index.spark, path, embedder=DeterministicEmbedder(dim=64))
    assert loaded.count() == 6
    rows = loaded.search_df(loaded.embedder.embed_batch(["cat"])[0], 3).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)  # descending: SemanticDatabase.cs:307
    # self-similarity: the query IS an indexed item, must rank first with ~1.0
    assert rows[0]["item"] == canonical_json("cat")
    assert math.isclose(scores[0], 1.0, abs_tol=1e-5)


def test_search_determinism(index):
    a = index.search_text("cat dog", 4)
    b = index.search_text("cat dog", 4)
    assert a == b  # deterministic embedder + deterministic tie-break


def test_search_first_and_object(index):
    assert index.search_first_text("banana") == "banana"
    # object query serializes to canonical JSON first: SemanticDatabase.cs:359-365
    assert index.search_first_object("banana") == "banana"
    # raw-vector SearchFirst (SemanticDatabase.cs:315-321): self-embedding
    # of a stored item must retrieve that item
    vec = index.embedder.embed_batch(['"banana"'])[0]
    assert index.search_first([float(x) for x in vec]) == "banana"


def test_json_single_file_roundtrip(index, tmp_path):
    # reference-compat single-file export (README.md:2)
    path = str(tmp_path / "index.json")
    index.save(path, fmt="json")
    loaded = SemanticIndex(index.spark, embedder=DeterministicEmbedder(dim=64))
    loaded.load(path, fmt="json")
    assert loaded.count() == 6
    assert sorted(loaded.get_all()) == sorted(ITEMS)


# --- duplicate policies (FIXTURES.md §A3, DuplicateHandling.cs:12,17,22,27) ---

def _fresh(spark, policy):
    idx = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=64), duplicate_handling=policy)
    idx.add_range(["a", "b", "c"])
    return idx


def test_policy_allow(spark):
    idx = _fresh(spark, DuplicateHandling.ALLOW)
    idx.add("b")
    assert idx.count() == 4  # duplicates coexist: DuplicateHandling.cs:12


def test_policy_update(spark):
    idx = _fresh(spark, DuplicateHandling.UPDATE)
    idx.add("b")
    assert idx.count() == 3  # remove-all-then-add: SemanticDatabase.cs:171-174
    assert idx.contains("b")


def test_policy_skip(spark):
    idx = _fresh(spark, DuplicateHandling.SKIP)
    idx.add("b")
    assert idx.count() == 3  # DuplicateHandling.cs:22


def test_policy_throw(spark):
    idx = _fresh(spark, DuplicateHandling.THROW)
    with pytest.raises(DuplicateItemError):
        idx.add("b")  # SemanticDatabase.cs:179-182
    idx.add("d")
    assert idx.count() == 4


def test_update_collapses_allow_duplicates(spark):
    # UPDATE removes ALL equal records before append (SemanticDatabase.cs:173)
    idx = _fresh(spark, DuplicateHandling.ALLOW)
    idx.add("b")
    assert idx.count() == 4
    idx.add("b", DuplicateHandling.UPDATE)
    assert idx.count() == 3


def test_remove_all_semantics(spark):
    # Remove deletes ALL equal items: SemanticDatabase.cs:431
    idx = _fresh(spark, DuplicateHandling.ALLOW)
    idx.add("b")
    idx.add("b")
    assert idx.count() == 5
    idx.remove("b")
    assert idx.count() == 2
    assert not idx.contains("b")


def test_remove_range_and_clear(spark):
    idx = _fresh(spark, DuplicateHandling.UPDATE)
    idx.remove_range(["a", "c"])
    assert idx.get_all() == ["b"]
    idx.clear()  # SemanticDatabase.cs:465-477
    assert idx.count() == 0


def test_refresh_embeddings(spark):
    # SemanticDatabase.cs:385-417: re-embed every item
    idx = _fresh(spark, DuplicateHandling.UPDATE)
    before = {r["item"]: r["embedding"] for r in idx.records.collect()}
    idx.refresh_embeddings()
    after = {r["item"]: r["embedding"] for r in idx.records.collect()}
    assert set(before) == set(after)
    for k in before:  # deterministic embedder → identical vectors
        assert before[k] == pytest.approx(after[k], abs=1e-6)


def test_object_items(spark):
    # T is any JSON-serializable type (SemanticDatabase.cs:161)
    idx = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=64))
    idx.add_range([{"name": "cat", "legs": 4}, {"name": "fish", "legs": 0}, [1, 2, 3]])
    assert idx.count() == 3
    assert idx.contains({"legs": 4, "name": "cat"})  # key order canonicalized
    got = idx.search_first_object({"name": "cat", "legs": 4})
    assert got == {"name": "cat", "legs": 4}


def test_search_rejects_wrong_dimension(spark):
    from semantic_index_spark import DeterministicEmbedder, SemanticIndex

    idx = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=8))
    idx.add_range(["a", "b"])
    with pytest.raises(ValueError, match="dim 3"):
        idx.search([1.0, 2.0, 3.0])


def test_search_rejects_wrong_dimension_without_embedder(spark, tmp_path):
    from semantic_index_spark import DeterministicEmbedder, SemanticIndex

    idx = SemanticIndex(spark, embedder=DeterministicEmbedder(dim=8))
    idx.add_range(["a", "b"])
    path = str(tmp_path / "noembed")
    idx.save(path)
    # from_file with no embedder: the driver-side dim check can't run, so
    # the plan-side raise_error guard must catch the mismatch instead of
    # silently returning NULL-scored arbitrary rows.
    loaded = SemanticIndex.from_file(spark, path)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        loaded.search([1.0, 2.0, 3.0])
    # matching dim still works
    assert len(loaded.search([0.0] * 8, count=1)) == 1


def test_search_dim_fast_fail_with_default_embedder(spark):
    # in-session index built via the DEFAULT embedder: the driver-side
    # dim check must still raise eagerly (only load() without a supplied
    # embedder defers to the plan-side guard).
    from semantic_index_spark import SemanticIndex

    idx = SemanticIndex(spark)
    idx.add_range(["a", "b"])
    with pytest.raises(ValueError, match="dim 3"):
        idx.search([1.0, 2.0, 3.0])
