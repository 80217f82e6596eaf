"""conette-prepare — dataset download, filtering and HDF packing.

Orchestration twin of the reference ``main_prepare``
(``src/conette/prepare.py:548-593``):

- model/resource downloads become registry resolution (egress-less hosts
  point ``CONETTE_CKPT_DIR`` at pre-fetched files; the reference downloads
  nltk/spacy/PANN/CNext checkpoints at ``prepare.py:66-136``);
- datasets resolve from **local audio directories + caption CSVs** (the
  reference pulls AudioCaps/Clotho/MACS/WavCaps via aac-datasets at
  ``prepare.py:139-276`` — network datasets must be staged locally here);
- filtering by index range / duration / sample rate with disk-cached
  metadata (``prepare.py:279-366``);
- packing each subset through the frozen ConvNeXt frontend
  (resample → mean → log-mel → frame embeddings) into deterministic
  ``{data}_{subset}_{audio_t}_{text_t}.hdf`` files (``prepare.py:369-504``),
  batched on the accelerator;
- a debug sanity pass that re-encodes one random item and compares it with
  the packed row (``prepare.py:485-545``).
"""

from __future__ import annotations

import csv
import logging
import os
import random
import sys
from typing import Any, Optional, Sequence

import numpy as np

pylog = logging.getLogger(__name__)


# --------------------------------------------------------------- local data
def load_audio_metadata(fpath: str) -> dict[str, Any]:
    """Duration/sample-rate metadata of one file (disk-cached by callers;
    twin of the torchaudio.info cache, ``prepare.py:279-366``)."""
    from conette_tpu.utils.audio_io import load_audio

    wav, sr = load_audio(fpath)
    return {
        "sample_rate": sr,
        "num_frames": wav.shape[1],
        "num_channels": wav.shape[0],
        "duration_s": wav.shape[1] / sr,
    }


def scan_local_dataset(
    audio_dir: str,
    captions_csv: str,
    dataset_name: str,
    subset: str,
    source: str | None = None,
) -> "LocalAudioDataset":
    """Build a dataset from a directory of WAVs + a captions CSV with
    columns ``file_name,caption`` (one row per reference)."""
    captions: dict[str, list[str]] = {}
    with open(captions_csv) as f:
        for row in csv.DictReader(f):
            captions.setdefault(row["file_name"], []).append(row["caption"])
    fnames = sorted(captions.keys())
    missing = [f for f in fnames if not os.path.isfile(os.path.join(audio_dir, f))]
    if missing:
        pylog.warning(f"{len(missing)} caption rows without audio files (skipped)")
        fnames = [f for f in fnames if f not in set(missing)]
    return LocalAudioDataset(audio_dir, fnames, captions, dataset_name, subset, source)


class LocalAudioDataset:
    """AACDatasetLike over local audio files."""

    def __init__(self, audio_dir, fnames, captions, dataset, subset, source) -> None:
        self._audio_dir = audio_dir
        self._fnames = fnames
        self._captions = captions
        self._dataset = dataset
        self._subset = subset
        self._source = source

    @property
    def column_names(self) -> list[str]:
        return ["audio", "captions", "dataset", "subset", "source", "fname"]

    def at(self, idx: int, column: str) -> Any:
        fname = self._fnames[idx]
        if column == "audio":
            from conette_tpu.utils.audio_io import load_audio

            return load_audio(os.path.join(self._audio_dir, fname))
        if column == "captions":
            return self._captions[fname]
        if column == "dataset":
            return self._dataset
        if column == "subset":
            return self._subset
        if column == "source":
            return self._source
        if column == "fname":
            return fname
        raise KeyError(column)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        return {c: self.at(idx, c) for c in self.column_names}

    def __len__(self) -> int:
        return len(self._fnames)


def filter_dataset(
    dataset: LocalAudioDataset,
    *,
    min_duration_s: float = 0.1,
    max_duration_s: float = 30.0,
    accepted_sample_rates: tuple[int, ...] | None = None,
    index_range: tuple[int, int] | None = None,
) -> list[int]:
    """Indexes passing duration / sample-rate / index filters
    (``prepare.py:279-366``)."""
    from conette_tpu.utils.disk_cache import disk_cache

    cached_meta = disk_cache(load_audio_metadata)
    file_backed = hasattr(dataset, "_audio_dir")
    keep: list[int] = []
    for i in range(len(dataset)):
        if index_range is not None and not (index_range[0] <= i < index_range[1]):
            continue
        if file_backed:
            fpath = os.path.join(dataset._audio_dir, dataset._fnames[i])
            meta = cached_meta(fpath)
        else:
            # in-memory datasets (aac-datasets adapter): derive metadata
            # from the loaded item instead of the WAV header
            wav, sr = dataset.at(i, "audio")
            meta = {
                "duration_s": float(np.asarray(wav).shape[-1]) / sr,
                "sample_rate": sr,
            }
        if not (min_duration_s <= meta["duration_s"] <= max_duration_s):
            continue
        if (
            accepted_sample_rates is not None
            and meta["sample_rate"] not in accepted_sample_rates
        ):
            continue
        keep.append(i)
    if len(keep) < len(dataset):
        pylog.info(f"Filtered {len(dataset) - len(keep)}/{len(dataset)} items")
    return keep


# --------------------------------------------------------- frontend packing
class ConvNeXtFrontend:
    """The offline ``resample_mean_convnext`` transform
    (twin of ``src/conette/transforms/get.py:240-310``): per-clip
    resample → channel mean → frozen ConvNeXt → (T, 768) frame embeddings
    (+ clip probs), batched on the accelerator."""

    def __init__(self, encoder_params: Any | None = None, seed: int = 0) -> None:
        from conette_tpu.huggingface.preprocessor import CoNeTTEPreprocessor

        self.preprocessor = CoNeTTEPreprocessor(encoder_params, seed=seed)

    def __call__(self, wav_and_sr: tuple[np.ndarray, int]) -> np.ndarray:
        wav, sr = wav_and_sr
        batch = self.preprocessor(np.asarray(wav)[None], sr=sr)
        n = int(np.asarray(batch["audio_shape"])[0, 1])
        return np.asarray(batch["audio"])[0, :n].astype(np.float32)

    def encode_dataset_batched(
        self, dataset: Any, indexes: list[int], batch_size: int = 8
    ) -> list[np.ndarray]:
        out: list[np.ndarray] = []
        for start in range(0, len(indexes), batch_size):
            chunk = indexes[start : start + batch_size]
            wavs, srs = [], []
            for i in chunk:
                wav, sr = dataset.at(i, "audio")
                wavs.append(wav)
                srs.append(sr)
            batch = self.preprocessor(wavs, sr=srs)
            embs = np.asarray(batch["audio"])
            lens = np.asarray(batch["audio_shape"])[:, 1]
            out.extend(embs[j, : int(lens[j])].astype(np.float32) for j in range(len(chunk)))
        return out


def pack_dataset_to_hdf(
    dataset: LocalAudioDataset,
    out_dir: str,
    *,
    audio_t_name: str = "resample_mean_convnext",
    text_t_name: str = "ident",
    encoder_params: Any | None = None,
    batch_size: int = 8,
    indexes: list[int] | None = None,
    overwrite: bool = False,
    debug_check: bool = False,
) -> str:
    """Encode + pack one subset with the deterministic reference naming
    ``{data}_{subset}_{audio_t}_{text_t}.hdf`` (``prepare.py:369-504``)."""
    from conette_tpu.data.datasets import DictDataset
    from conette_tpu.data.hdf import pack_to_hdf

    if indexes is None:
        indexes = list(range(len(dataset)))
    frontend = ConvNeXtFrontend(encoder_params)
    embs = frontend.encode_dataset_batched(dataset, indexes, batch_size)

    columns: dict[str, list] = {
        "audio": embs,
        "audio_lens": [int(e.shape[0]) for e in embs],
        "captions": [dataset.at(i, "captions") for i in indexes],
        "dataset": [dataset.at(i, "dataset") for i in indexes],
        "subset": [dataset.at(i, "subset") for i in indexes],
        "source": [dataset.at(i, "source") for i in indexes],
        "fname": [dataset.at(i, "fname") for i in indexes],
    }
    packed = DictDataset(columns)
    name = f"{columns['dataset'][0]}_{columns['subset'][0]}_{audio_t_name}_{text_t_name}.hdf"
    fpath = os.path.join(out_dir, name)
    os.makedirs(out_dir, exist_ok=True)
    pack_to_hdf(packed, fpath, overwrite=overwrite)

    if debug_check:
        from conette_tpu.data.hdf import HDFDataset

        loaded = HDFDataset(fpath)
        j = random.Random(0).randrange(len(indexes))
        re_enc = frontend(dataset.at(indexes[j], "audio"))
        packed_audio = loaded.at(j, "audio")
        if not np.allclose(re_enc, packed_audio, atol=1e-4):
            raise RuntimeError(
                f"HDF sanity check failed for item {j} of {fpath} "
                f"(max diff {np.abs(re_enc - packed_audio).max()})"
            )
        pylog.info(f"HDF sanity check OK for {fpath}")
    return fpath


# ----------------------------------------------------------------- main CLI
# ------------------------------------------------- download orchestration
#: aac-datasets class names per dataset (reference prepare.py:139-276)
_AAC_DATASET_CLASSES = {
    "clotho": "Clotho",
    "audiocaps": "AudioCaps",
    "macs": "MACS",
    "wavcaps": "WavCaps",
}


def download_dataset(
    name: str,
    root: str = "data",
    subsets: Sequence[str] | None = None,
    verbose: int = 1,
    **dataset_kwargs: Any,
) -> list[Any]:
    """Download a captioning dataset through ``aac-datasets`` (twin of the
    reference's download_dataset, ``prepare.py:139-276``; AudioCaps also
    needs yt-dlp + ffmpeg on PATH). On egress-less hosts this raises with
    the staging instructions instead of failing mid-download."""
    name_l = name.lower()
    if name_l not in _AAC_DATASET_CLASSES:
        raise ValueError(
            f"Unknown dataset {name!r} (expected one of "
            f"{sorted(_AAC_DATASET_CLASSES)})"
        )
    try:
        import aac_datasets
    except ImportError as err:
        raise RuntimeError(
            "Dataset download needs the `aac-datasets` package (not baked "
            "into egress-less TPU images). Stage the audio + captions "
            "manually and use --audio_dir/--captions_csv instead, or "
            "`pip install aac-datasets` on a connected host."
        ) from err
    cls = getattr(aac_datasets, _AAC_DATASET_CLASSES[name_l])
    subsets = list(subsets) if subsets is not None else [None]
    out = []
    for subset in subsets:
        kwargs = dict(root=root, download=True, verbose=verbose, **dataset_kwargs)
        if subset is not None:
            kwargs["subset"] = subset
        out.append(cls(**kwargs))
        pylog.info(f"Downloaded {name}/{subset or 'default'} into {root}.")
    return out


def download_metric_resources(cache_dir: str | None = None, verbose: int = 1) -> None:
    """Fetch the PTB/METEOR/SPICE jars + FENSE models (twin of the
    reference's download_aac_metrics call, ``prepare.py:567-576``). Uses
    ``aac-metrics`` when importable; otherwise points at
    ``scripts/download_metric_resources.sh`` for manual staging."""
    cache_dir = cache_dir or os.path.expanduser("~/.cache/conette_tpu/aac-metrics")
    try:
        from aac_metrics.download import download_metrics
    except ImportError as err:
        raise RuntimeError(
            "Metric-resource download needs `aac-metrics` (not baked into "
            "egress-less TPU images). Run scripts/download_metric_resources.sh "
            f"on a connected host and stage the jars under {cache_dir} "
            "(or set CONETTE_PTB_JAR / CONETTE_METEOR_JAR / CONETTE_SPICE_JAR)."
        ) from err
    download_metrics(cache_path=cache_dir, verbose=verbose)


class AacDatasetAdapter:
    """AACDatasetLike over an ``aac-datasets`` dataset object (Clotho,
    AudioCaps, MACS, WavCaps): maps its item dicts onto the packing
    protocol so downloaded datasets flow straight into HDF packing."""

    def __init__(self, ds: Any, dataset: str, subset: str,
                 source: str | None = None) -> None:
        self._ds = ds
        self._dataset = dataset
        self._subset = subset
        self._source = source

    @property
    def column_names(self) -> list[str]:
        return ["audio", "captions", "dataset", "subset", "source", "fname"]

    def at(self, idx: int, column: str) -> Any:
        if column in ("dataset", "subset", "source"):
            return getattr(self, f"_{column}")
        item = self._ds[idx]
        if column == "audio":
            wav = np.asarray(item["audio"], np.float32)
            if wav.ndim == 1:
                wav = wav[None]
            return wav, int(item.get("sr", item.get("sample_rate", 32_000)))
        if column == "captions":
            return list(item["captions"])
        if column == "fname":
            return str(item.get("fname", item.get("file_name", f"item_{idx}.wav")))
        raise KeyError(column)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        return {c: self.at(idx, c) for c in self.column_names}

    def __len__(self) -> int:
        return len(self._ds)


def main_prepare_config(argv: list[str]) -> int:
    """Hydra-style config mode (reference ``conf/prepare.yaml`` flow):

        conette-prepare data=clotho data.subsets=[dev,val] data.download=true

    Composes ``conf/prepare.yaml``, optionally downloads through
    aac-datasets, and packs each subset with the configured frontend."""
    from conette_tpu.config import load_config

    cfg = load_config("prepare", argv)
    data_cfg = dict(cfg.get("data", {}))
    name = data_cfg.get("name", "none")
    if cfg.get("download_metric_resources"):
        download_metric_resources(verbose=int(cfg.get("verbose", 1)))
    if name in ("none", "hdf", None):
        pylog.info("No dataset selected (data=none/hdf); nothing to pack.")
        return 0

    subsets = data_cfg.get("subsets") or [None]
    root = str(data_cfg.get("root", "data"))
    if data_cfg.get("download"):
        datasets = download_dataset(
            name, root, subsets=subsets, verbose=int(cfg.get("verbose", 1))
        )
    else:
        try:
            import aac_datasets
        except ImportError:
            pylog.error(
                "Config-mode packing reads datasets through `aac-datasets` "
                "(not in egress-less images). Use the local flags instead: "
                "conette-prepare --audio_dir ... --captions_csv ..."
            )
            return 2
        cls = getattr(aac_datasets, _AAC_DATASET_CLASSES[name])
        datasets = [
            cls(root=root, subset=s, download=False) if s is not None
            else cls(root=root, download=False)
            for s in subsets
        ]

    encoder_params = None
    pretrain = dict(cfg.get("audio_t", {})).get("pretrain_path")
    if pretrain:
        from conette_tpu.models.registries import load_registry_encoder

        try:
            encoder_params = load_registry_encoder(str(pretrain))
        except FileNotFoundError as err:
            pylog.warning(f"Encoder checkpoint not staged ({err}); random init.")

    audio_t_name = str(
        dict(cfg.get("audio_t", {})).get("_target_", "resample_mean_convnext")
    ).rsplit("get_", 1)[-1]
    out_root = str(cfg.get("out_root", "data/HDF"))
    filters = dict(cfg.get("filters", {}))
    for ds, subset in zip(datasets, subsets):
        adapter = AacDatasetAdapter(ds, name, subset or "full")
        indexes = filter_dataset(
            adapter,
            min_duration_s=float(filters.get("min_duration_s", 0.1) or 0.0),
            max_duration_s=float(filters.get("max_duration_s", 30.0) or 1e9),
        )
        fpath = pack_dataset_to_hdf(
            adapter, out_root,
            audio_t_name=audio_t_name,
            encoder_params=encoder_params,
            batch_size=int(dict(cfg.get("data", {})).get("bsize", 8) or 8),
            indexes=indexes,
            overwrite=bool(cfg.get("overwrite_hdf", False)),
            debug_check=bool(cfg.get("debug", False)),
        )
        pylog.info(f"Packed {name}/{subset}: {len(indexes)} items -> {fpath}")
    return 0


def get_prepare_args(argv: Optional[list[str]] = None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Pack local audio datasets into HDF for conette-train."
    )
    parser.add_argument("--audio_dir", type=str, required=False)
    parser.add_argument("--captions_csv", type=str, required=False)
    parser.add_argument("--dataset", type=str, default="clotho")
    parser.add_argument("--subset", type=str, default="dev")
    parser.add_argument("--source", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="data/HDF")
    parser.add_argument("--encoder", type=str, default=None,
                        help="Registry name (e.g. cnext_bl_75) or params.npz path.")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--min_duration", type=float, default=0.1)
    parser.add_argument("--max_duration", type=float, default=30.0)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--verbose", type=int, default=1)
    parser.add_argument("--download", type=str, default=None,
                        help="Download a dataset first via aac-datasets "
                             "(clotho|audiocaps|macs|wavcaps; connected hosts only).")
    parser.add_argument("--download_root", type=str, default="data")
    parser.add_argument("--download_subsets", type=str, nargs="*", default=None)
    parser.add_argument("--download_metric_resources", action="store_true",
                        help="Fetch PTB/METEOR/SPICE jars via aac-metrics.")
    return parser.parse_args(argv)


def main_prepare(argv: Optional[list[str]] = None) -> int:
    raw_argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s | %(message)s")
    if raw_argv and all("=" in a and not a.startswith("-") for a in raw_argv):
        # hydra-style overrides -> config mode (reference conf/prepare.yaml)
        return main_prepare_config(raw_argv)
    args = get_prepare_args(argv)
    if args.download:
        download_dataset(
            args.download, args.download_root,
            subsets=args.download_subsets, verbose=args.verbose,
        )
    if args.download_metric_resources:
        download_metric_resources(verbose=args.verbose)
        if not args.audio_dir:
            return 0
    if not args.audio_dir or not args.captions_csv:
        pylog.error(
            "conette-prepare packs LOCAL datasets on egress-less TPU hosts: "
            "pass --audio_dir and --captions_csv (file_name,caption rows). "
            "The reference's aac-datasets downloads must be staged beforehand."
        )
        return 2

    encoder_params = None
    if args.encoder:
        if os.path.isfile(args.encoder):
            from conette_tpu.huggingface.convert import load_params_npz

            encoder_params = load_params_npz(args.encoder)
        else:
            from conette_tpu.models.registries import load_registry_encoder

            encoder_params = load_registry_encoder(args.encoder)

    dataset = scan_local_dataset(
        args.audio_dir, args.captions_csv, args.dataset, args.subset, args.source
    )
    indexes = filter_dataset(
        dataset, min_duration_s=args.min_duration, max_duration_s=args.max_duration
    )
    fpath = pack_dataset_to_hdf(
        dataset,
        args.out_dir,
        encoder_params=encoder_params,
        batch_size=args.batch_size,
        indexes=indexes,
        overwrite=args.overwrite,
        debug_check=args.debug,
    )
    pylog.info(f"Packed {len(indexes)} items → {fpath}")
    return 0


if __name__ == "__main__":
    from conette_tpu.utils.misc import hard_exit

    hard_exit(main_prepare())
