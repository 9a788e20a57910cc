"""The curate_training_corpus example is the end-to-end integration test
of the training-data stack: every stage must run and the survivor counts
must be monotone where the pipeline semantics require it."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curate_training_corpus_example(spark):
    spec = importlib.util.spec_from_file_location(
        "curate_example", os.path.join(REPO, "examples", "curate_training_corpus.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    c = mod.main("/root/testdata/sf0.001")
    assert c["after_quality"] <= c["input"]
    assert c["after_neardup"] <= c["after_quality"]
    assert c["after_decontamination"] <= c["after_neardup"]
    assert c["redacted_rows"] == c["after_decontamination"]
    assert c["after_mixture"] <= c["after_decontamination"]
    assert c["embeddings_kept"] > 0
    assert c["chunks"] > 0 and c["bins"] > 0
