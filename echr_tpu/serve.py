"""Batched caption serving.

A production-facing API over the batched device pipeline: hand it raw
C3D feature arrays, get dense captions back.  Groups requests by time
bucket, pads proposals to a bucket, keeps two device batches in flight to
hide host<->device latency, and decodes greedily or with beam search.

This is the deployment shape the benchmark measures (docs/BENCH_NOTES.md);
the reference has no serving path at all — its eval loop is one video and
one proposal batch at a time through Python.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from echr_tpu.config import Config
from echr_tpu.data.batcher import pick_bucket
from echr_tpu.data.labels import featstamp_to_time
from echr_tpu.engine import proposals as P
from echr_tpu.models.captioner import ProposalBatch
from echr_tpu.engine.evaluate import PROP_BUCKETS, _prop_bucket
from echr_tpu.utils.text import decode_sequence


@dataclasses.dataclass
class CaptionRequest:
    vid: str
    feats: np.ndarray  # [T, D] C3D features (normalised)
    duration: float
    lda: Optional[np.ndarray] = None  # scene topic vector; zeros if absent


@dataclasses.dataclass
class Caption:
    timestamp: Tuple[float, float]
    sentence: str
    proposal_score: float
    sentence_confidence: float


def _effective_duration(r: "CaptionRequest", T_use: int) -> float:
    """Duration of the retained frame prefix: requests longer than the max
    time bucket are prefix-truncated, and frame i still spans
    duration*i/T_real seconds — mirrors make_batch's dur_use so proposal
    timestamps stay on the real clock (review r3 fourth session)."""
    T_real = len(r.feats)
    return r.duration * (T_use / T_real) if T_use < T_real else r.duration


class CaptionService:
    """Stateless-per-call batched captioner."""

    def __init__(self, cfg: Config, tap_params, cg_params, vocab: Dict[str, str],
                 batch_videos: int = 32, topN: int = 100,
                 nms_threshold: float = 0.0, beam_size: int = 1, mesh=None):
        self.cfg = cfg
        self.tap_params = tap_params
        self.cg_params = cg_params
        self.vocab = vocab
        self.batch_videos = batch_videos
        self.topN = topN
        self.nms_threshold = nms_threshold
        self.beam_size = beam_size
        # multi-chip serving: replicate params, shard the video batch axis
        # over the mesh's data axis (chunks padded to a dp multiple).
        # runtime.spmd_mode="shard_map" (dp meshes) routes every batched
        # step through its explicit per-device variant so the Pallas
        # decode kernel fires at local shapes — eval_steps_for is the one
        # router shared with eval_split_batched.
        from echr_tpu.engine.steps import eval_steps_for

        self.mesh = mesh
        self._steps = eval_steps_for(cfg, mesh)
        self._use_sm = self._steps.shard_mapped
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as PS

            rep = NamedSharding(mesh, PS())
            self.tap_params = jax.device_put(tap_params, rep)
            self.cg_params = jax.device_put(cg_params, rep)
            self._dp_sharding = NamedSharding(mesh, PS("data"))
        else:
            # device-resident params at service build: a host-numpy
            # checkpoint tree (load_service) would otherwise re-upload all
            # weights on every chunk dispatch (see engine/evaluate.py —
            # measured 10x pass slowdown through the relay); no-op on
            # live device arrays
            import jax
            import jax.numpy as jnp

            self.tap_params = jax.tree.map(jnp.asarray, tap_params)
            self.cg_params = jax.tree.map(jnp.asarray, cg_params)

    def caption(self, requests: Sequence[CaptionRequest]) -> Dict[str, List[Caption]]:
        """Caption a batch of requests.

        Chunks are software-pipelined: while a chunk's decode runs on
        device, the previous chunk's token fetch + host-side sentence
        decoding proceed, and the next chunk's encode is dispatched before
        collecting — the same two-in-flight pattern as the benchmark's
        batched pipeline, here across the full encode->select->decode
        service loop."""
        import jax.numpy as jnp

        cfg = self.cfg
        out: Dict[str, List[Caption]] = {}
        # group by time bucket for static shapes
        groups: Dict[int, List[CaptionRequest]] = {}
        for r in requests:
            groups.setdefault(pick_bucket(len(r.feats), cfg.data.time_buckets), []).append(r)

        pending = None  # previous chunk's dispatched-but-uncollected decode

        def collect(entry):
            import jax

            chunk, sels, nb, seq_d, score_d, is_beam = entry
            # one batched transfer (sequential np.asarray pays the RTT each)
            seq_np, score_np = jax.device_get((seq_d, score_d))
            if not is_beam:
                score_np = score_np.sum(axis=2)
            for i, (r, (ind, soi, ts, tp)) in enumerate(zip(chunk, sels)):
                n = min(len(ind), nb)
                sents = decode_sequence(self.vocab, seq_np[i][:n])
                out[r.vid] = [
                    Caption(
                        timestamp=tuple(ts[j]),
                        sentence=sents[j],
                        proposal_score=float(tp[j]),
                        sentence_confidence=float(score_np[i][j]),
                    )
                    for j in range(n)
                ]

        for bucket, reqs in groups.items():
            for i0 in range(0, len(reqs), self.batch_videos):
                chunk = reqs[i0 : i0 + self.batch_videos]
                B = len(chunk)
                Bp = B  # padded batch rows (multi-chip: dp multiple)
                if self.mesh is not None:
                    dp = self.mesh.shape["data"]
                    Bp = B + ((-B) % dp)
                D = chunk[0].feats.shape[1]
                feats = np.zeros((Bp, bucket, D), np.float32)
                fmask = np.zeros((Bp, bucket), np.float32)
                fmask[B:, :2] = 1.0  # padded rows: minimal valid video
                lda = np.zeros((Bp, cfg.data.lda_dim), np.float32)
                for i, r in enumerate(chunk):
                    T = min(len(r.feats), bucket)
                    feats[i, :T] = r.feats[:T]
                    fmask[i, :T] = 1.0
                    if r.lda is not None:
                        lda[i] = r.lda

                def shard(x):
                    import jax

                    return (jax.device_put(x, self._dp_sharding)
                            if self.mesh is not None else x)

                if cfg.runtime.transfer_dtype == "bfloat16":
                    # halved feature payload, upcast on device
                    # (see RuntimeConfig.transfer_dtype)
                    feats_d = shard(jnp.asarray(
                        feats.astype(jnp.bfloat16)).astype(jnp.float32))
                else:
                    feats_d = shard(jnp.asarray(feats))
                tap_feats, pred_props = self._steps.encode(
                    self.tap_params, feats_d, cfg)
                # the previous chunk's decode overlaps this encode + the
                # proposal-score fetch below; collect it before selection
                if pending is not None:
                    collect(pending)
                    pending = None

                sels = []
                max_n = 1
                if not self.nms_threshold:
                    # top-N selection on device (== P.top_proposals, see
                    # engine.steps.select_topk_batched): fetch [B, nb]
                    # indices instead of the [B, T, K] score grid
                    from echr_tpu.engine.steps import unpack_topk_selection

                    K = cfg.tap.K
                    # bucket ceiling so threshold ties are kept exactly
                    # like the host path (see select_topk_batched)
                    nb_sel = PROP_BUCKETS[-1]
                    nfr = np.array([int(fmask[i].sum()) for i in range(Bp)],
                                   np.int32)
                    import jax

                    idx_np, cnt_np, conf_np = jax.device_get(
                        self._steps.select_topk(
                            pred_props, shard(jnp.asarray(nfr)),
                            topN=self.topN, nb=nb_sel))
                    for i, r in enumerate(chunk):
                        ind, soi, ts, tp = unpack_topk_selection(
                            idx_np[i], cnt_np[i], nb_sel, K, int(nfr[i]),
                            _effective_duration(r, int(nfr[i])),
                            featstamp_to_time, conf_np[i])
                        sels.append((ind, soi, ts, tp))
                        max_n = max(max_n, len(ind))
                else:
                    pp = np.asarray(pred_props)
                    from echr_tpu.data.labels import anchor_mask

                    for i, r in enumerate(chunk):
                        T = int(fmask[i].sum())
                        masks = anchor_mask(T, cfg.tap.K)
                        ind, soi, _, ts, tp = P.top_proposals_nms(
                            pp[i][:T], masks, None, _effective_duration(r, T),
                            featstamp_to_time,
                            overlap=self.nms_threshold, topN=self.topN,
                        )
                        sels.append((ind, soi, ts, tp))
                        max_n = max(max_n, len(ind))

                nb = _prop_bucket(max_n)
                pi = np.zeros((Bp, nb), np.int32)
                ps = np.tile(np.array([[0, 1]], np.int32), (Bp, nb, 1)).reshape(Bp, nb, 2)
                pm = np.zeros((Bp, nb), np.float32)
                for i, (ind, soi, _, _) in enumerate(sels):
                    n = min(len(ind), nb)
                    pi[i, :n] = np.asarray(ind)[:n]
                    ps[i, :n] = np.asarray(soi)[:n]
                    pm[i, :n] = 1.0
                # one batched host->device transfer for props+lda+frame_mask
                import jax

                if self.mesh is not None:
                    pi_d, ps_d, pm_d, lda_d, fm_d = jax.device_put(
                        (pi, ps, pm, lda, fmask), self._dp_sharding)
                else:
                    pi_d, ps_d, pm_d, lda_d, fm_d = jax.device_put(
                        (pi, ps, pm, lda, fmask))
                props = ProposalBatch(pi_d, ps_d, pm_d)

                if self.beam_size > 1:
                    seq, logp = self._steps.beam(
                        self.cg_params, cfg, tap_feats, feats_d, lda_d, fm_d,
                        props, self.beam_size,
                        length_alpha=float(cfg.eval.beam_length_alpha),
                    )
                    pending = (chunk, sels, nb, seq, logp, True)
                else:
                    seq, logps, active = self._steps.decode(
                        self.cg_params, cfg, tap_feats, feats_d, lda_d, fm_d,
                        props
                    )
                    pending = (chunk, sels, nb, seq, logps, False)
        if pending is not None:
            collect(pending)
        return out


def from_checkpoint(path: str, **kw) -> CaptionService:
    """Build a service from a training checkpoint."""
    from echr_tpu.engine import checkpoint as ckpt

    payload = ckpt.load_checkpoint(path)
    cfg = payload["config"]
    state = payload["state"]
    vocab = payload.get("vocab")
    if not vocab:
        # fail at load time with a clear message, not with a KeyError deep
        # inside decode_sequence after minutes of compiles
        raise ValueError(
            f"checkpoint {path} carries no vocab — the caption service "
            "cannot render token ids to words; re-save the checkpoint with "
            "vocab (engine.checkpoint.save_checkpoint(vocab=...))")
    return CaptionService(cfg, state.tap_params, state.cg_params, vocab, **kw)
