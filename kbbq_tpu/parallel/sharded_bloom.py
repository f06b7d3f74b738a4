"""Hash-space-sharded Bloom pipeline (BASELINE config 4; SURVEY.md H4).

When the trusted filter exceeds per-chip HBM (human-scale genomes), the
BLOCK space is sharded across the mesh instead of replicated:

- device d owns slot range [d*m/D, (d+1)*m/D) (contiguous blocks);
- INSERT: each device all-gathers the batch's k-mers over the reads axis
  (ICI), then scatter-sets only the probes that fall in its range —
  every k-mer reaches its owner, writes stay commutative (SURVEY.md H5);
- QUERY: all-gather the query k-mers, each device answers for its blocks
  (False elsewhere), and a psum over the reads axis combines the partial
  verdicts (exactly one device owns each block, so the sum IS the
  owner's answer); each device then slices back its own reads' rows;
- the pass-3 walk plugs this collective query into infer_errors_core —
  one all-gather + psum per round.

Output is bit-identical to the single-chip pipeline (tests assert it):
all arithmetic is the same integer math, only the filter's location
changes.  Bandwidth note: all-gather costs (batch k-mer stream x D) over
ICI; an all_to_all routing layer would cut this by D and is the next
optimization if config-4 benchmarks demand it.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.batcher import Batch, Batcher, ReadArrays
from ..oracle.bloom import BloomParams
from ..oracle.gatk import build_recal_table
from ..oracle.kmers import alpha_threshold
from ..oracle.lighter import coverage_thresholds
from ..ops.bloom import bloom_rows, bloom_query_rows, probe_positions
from ..ops.covariate import accumulate_covariates, new_covariate_state
from ..ops.inference import infer_errors_core
from ..ops.kmers import canonical_kmers_batch, sample_keep_mask
from ..ops.recal import apply_recal_table
from ..ops.trusted import trusted_mask_batch
from ..pipeline.recalibrate import RecalConfig
from ..state.covariate import CovariateAccumulator
from .mesh import READS_AXIS, make_mesh

R = READS_AXIS


def _shmap(mesh, in_specs, out_specs):
    return functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)


def _local_insert(slots_local, hi, lo, mask, num_hashes, log2_m, lo_slot,
                  hi_slot):
    """Scatter-set only probes within [lo_slot, hi_slot) (owner range)."""
    pos = probe_positions(hi, lo, num_hashes, log2_m).astype(jnp.int32)
    mine = mask[..., None] & (pos >= lo_slot) & (pos < hi_slot)
    local = pos - lo_slot
    local = jnp.where(mine, local, hi_slot - lo_slot)  # OOB -> dropped
    return slots_local.at[local.reshape(-1)].set(jnp.uint8(1), mode="drop")


def build_steps(mesh: Mesh, k: int, num_hashes: int, log2_m_a: int,
                log2_m_b: int, trust_threshold: int | None = None,
                ext_cap: int | None = None):
    D = mesh.devices.size

    def my_range(log2_m):
        shard = (1 << log2_m) // D
        d = jax.lax.axis_index(R)
        return d * shard, (d + 1) * shard

    def collective_query(packed_local, hi, lo, log2_m):
        """hi/lo are the LOCAL batch rows; returns local hits."""
        Bd = hi.shape[0]
        ghi = jax.lax.all_gather(hi, R, tiled=True)
        glo = jax.lax.all_gather(lo, R, tiled=True)
        # local packed covers blocks [d*R32, (d+1)*R32)
        shard_words = (1 << log2_m) // 32 // D
        d = jax.lax.axis_index(R)
        # shift block ids into local space; OOB -> miss
        from ..ops.bloom import block_and_offsets
        block, off = block_and_offsets(ghi, glo, num_hashes, log2_m)
        local_block = block - d * shard_words
        in_range = (local_block >= 0) & (local_block < shard_words)
        word = packed_local[jnp.clip(local_block, 0, shard_words - 1)]
        bits = (word[..., None] >> off.astype(jnp.uint32)) & jnp.uint32(1)
        hit_local = (jnp.min(bits, axis=-1) > 0) & in_range
        hits = jax.lax.psum(hit_local.astype(jnp.int32), R) > 0
        d_idx = jax.lax.axis_index(R)
        return jax.lax.dynamic_slice_in_dim(hits, d_idx * Bd, Bd, axis=0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    @_shmap(mesh, in_specs=(P(R), P(R, None), P(R), P()),
            out_specs=P(R))
    def step_sample(slots_local, codes, read_ids, threshold):
        hi, lo, valid = canonical_kmers_batch(codes, k)
        keep = valid & sample_keep_mask(read_ids, hi.shape[1], threshold)
        ghi = jax.lax.all_gather(hi, R, tiled=True)
        glo = jax.lax.all_gather(lo, R, tiled=True)
        gkeep = jax.lax.all_gather(keep, R, tiled=True)
        lo_s, hi_s = my_range(log2_m_a)
        return _local_insert(slots_local, ghi, glo, gkeep, num_hashes,
                             log2_m_a, lo_s, hi_s)

    @functools.partial(jax.jit, donate_argnums=(1,))
    @_shmap(mesh, in_specs=(P(R), P(R), P(R, None), P()),
            out_specs=P(R))
    def step_trusted(packed_a_local, slots_b_local, codes, t_table):
        hi, lo, valid = canonical_kmers_batch(codes, k)
        hits = collective_query(packed_a_local, hi, lo, log2_m_a) & valid
        tr = trusted_mask_batch(hits, valid, t_table, k, trust_threshold)
        ghi = jax.lax.all_gather(hi, R, tiled=True)
        glo = jax.lax.all_gather(lo, R, tiled=True)
        gtr = jax.lax.all_gather(tr, R, tiled=True)
        lo_s, hi_s = my_range(log2_m_b)
        return _local_insert(slots_b_local, ghi, glo, gtr, num_hashes,
                             log2_m_b, lo_s, hi_s)

    @functools.partial(jax.jit, donate_argnums=(0,))
    @_shmap(mesh, in_specs=(P(R),), out_specs=P(R))
    def pack_local(slots_local):
        return bloom_rows(slots_local)

    cov_spec = {k_: P(R, *([None] * 3)) for k_ in
                ("cyc_total", "cyc_errors", "din_total", "din_errors")}

    @functools.partial(jax.jit, donate_argnums=(1,))
    @_shmap(mesh,
            in_specs=(P(R), cov_spec, P(R, None), P(R, None), P(R, None),
                      P(R), P(R)),
            out_specs=cov_spec)
    def step_covariates(packed_b_local, cov_dm, codes, quals, mask, rgs,
                        seconds):
        qf = lambda hi, lo: collective_query(packed_b_local, hi, lo,
                                             log2_m_b)
        gany = lambda x: jax.lax.psum(
            jnp.any(x).astype(jnp.int32), R) > 0
        errors = infer_errors_core(qf, codes, k, reduce_any=gany,
                                   ext_cap=ext_cap)
        local = {kk: v[0] for kk, v in cov_dm.items()}
        out = accumulate_covariates(local, codes, quals, mask, rgs,
                                    seconds, errors)
        return {kk: v[None] for kk, v in out.items()}

    @jax.jit
    @_shmap(mesh,
            in_specs=(P(), P(R, None), P(R, None), P(R, None), P(R), P(R)),
            out_specs=P(R, None))
    def step_recal(recal, codes, quals, mask, rgs, seconds):
        return apply_recal_table(recal, codes, quals, mask, rgs, seconds)

    return {"sample": step_sample, "trusted": step_trusted,
            "pack": pack_local, "covariates": step_covariates,
            "recal": step_recal}


class ShardedBloomRecalPipeline:
    """P1-P4 with the Bloom slot space sharded across the mesh."""

    def __init__(self, config: RecalConfig, num_rg: int, max_len: int,
                 total_bases: int, total_kmers: int,
                 mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh()
        self.D = self.mesh.devices.size
        if config.batch_size % self.D:
            raise ValueError("batch_size must divide device count")
        self.config = config
        self.num_rg = num_rg
        self.max_len = max_len
        self.alpha, self.coverage = config.resolve_alpha(total_bases)
        self.threshold = jnp.uint32(alpha_threshold(self.alpha))
        self.t_table = self._replicate(jnp.asarray(
            coverage_thresholds(self.alpha, config.k), dtype=jnp.int32))
        # shard constraint: m/32 must divide D -> bump log2_m
        min_log2 = 5 + max(1, self.D).bit_length() + 5
        from ..oracle.pipeline import expected_bloom_keys
        n_a, n_b = expected_bloom_keys(total_kmers, self.alpha,
                                       self.coverage)
        self.params_a = BloomParams.for_keys(
            n_a, config.sampled_bits_per_key, config.num_hashes)
        self.params_b = BloomParams.for_keys(
            n_b, config.trusted_bits_per_key, config.num_hashes)
        if self.params_a.log2_m < min_log2:
            self.params_a = BloomParams(min_log2, config.num_hashes)
        if self.params_b.log2_m < min_log2:
            self.params_b = BloomParams(min_log2, config.num_hashes)
        self.steps = build_steps(self.mesh, config.k, config.num_hashes,
                                 self.params_a.log2_m, self.params_b.log2_m,
                                 config.trust_threshold, config.ext_cap)
        self.cov = CovariateAccumulator(num_rg, max_len,
                                        config.batch_size * max_len)
        self.cov_dm = self._dev_tables()
        self.recal_table = None

    # --------------------------------------------------------- helpers
    def _replicate(self, x):
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def _shard_rows(self, x):
        spec = P(R, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, spec))

    def _dev_tables(self):
        base = new_covariate_state(self.num_rg, self.max_len)
        return {kk: self._shard_rows(jnp.zeros((self.D,) + v.shape, v.dtype))
                for kk, v in base.items()}

    def _empty_sharded(self, params: BloomParams):
        return self._shard_rows(jnp.zeros(params.m, dtype=jnp.uint8))

    def _put_batch(self, b: Batch):
        return (self._shard_rows(b.codes), self._shard_rows(b.quals),
                self._shard_rows(b.mask), self._shard_rows(b.rgs),
                self._shard_rows(b.seconds), self._shard_rows(b.read_ids))

    # ---------------------------------------------------------- passes
    def run_pass1(self, batches: Iterable[Batch]) -> None:
        slots = self._empty_sharded(self.params_a)
        for b in batches:
            codes, _, _, _, _, rids = self._put_batch(b)
            slots = self.steps["sample"](slots, codes, rids, self.threshold)
        self.packed_a = self.steps["pack"](slots)

    def run_pass2(self, batches: Iterable[Batch]) -> None:
        slots_b = self._empty_sharded(self.params_b)
        for b in batches:
            codes, *_ = self._put_batch(b)
            slots_b = self.steps["trusted"](self.packed_a, slots_b, codes,
                                            self.t_table)
        self.packed_b = self.steps["pack"](slots_b)

    def run_pass3(self, batches: Iterable[Batch]) -> None:
        for b in batches:
            codes, quals, mask, rgs, seconds, _ = self._put_batch(b)
            self.cov_dm = self.steps["covariates"](
                self.packed_b, self.cov_dm, codes, quals, mask, rgs,
                seconds)
        s = {kk: np.asarray(v).astype(np.int64).sum(axis=0)
             for kk, v in self.cov_dm.items()}
        self.cov.totals.cyc_total += s["cyc_total"]
        self.cov.totals.cyc_errors += s["cyc_errors"]
        self.cov.totals.din_total += s["din_total"]
        self.cov.totals.din_errors += s["din_errors"]
        self.cov_dm = self._dev_tables()

    def compute_recal_table(self):
        self.recal_table = build_recal_table(self.cov.totals)
        self._recal_dev = self._replicate(jnp.asarray(self.recal_table))
        return self.recal_table

    def apply_recal(self, b: Batch):
        codes, quals, mask, rgs, seconds, _ = self._put_batch(b)
        return self.steps["recal"](self._recal_dev, codes, quals, mask,
                                   rgs, seconds)

    def run_pass4(self, batches: Iterable[Batch]) -> np.ndarray:
        outs, reals = [], []
        for b in batches:
            outs.append(self.apply_recal(b))
            reals.append(b.num_real)
        if not outs:
            return np.zeros((0, 0))
        return np.concatenate(
            [np.asarray(o)[:r] for o, r in zip(outs, reals)], axis=0)


def sharded_bloom_recalibrate_arrays(arrays: ReadArrays,
                                     config: RecalConfig,
                                     mesh: Mesh | None = None,
                                     start_ordinal: int = 0,
                                     checkpoint_dir: str | None = None
                                     ) -> np.ndarray:
    k = config.k
    lens = arrays.mask.sum(axis=1)
    total_bases = int(lens.sum())
    total_kmers = int(np.maximum(lens - k + 1, 0).sum())
    num_rg = int(arrays.rgs.max(initial=0)) + 1
    pipe = ShardedBloomRecalPipeline(config, num_rg, arrays.max_len,
                                     total_bases, total_kmers, mesh)
    mk = lambda: Batcher(arrays, config.batch_size, start_ordinal)

    ckpt = None
    if checkpoint_dir:
        from ..state.checkpoint import Checkpoint, run_fingerprint
        ckpt = Checkpoint(checkpoint_dir)
        ckpt.check_fingerprint(run_fingerprint(config, arrays))

    # checkpoints hold the gathered packed rows; resume re-shards them
    rows = ckpt.load_array("rows_a_sharded") if ckpt else None
    if rows is not None:
        pipe.packed_a = pipe._shard_rows(jnp.asarray(rows))
    else:
        pipe.run_pass1(mk())
        if ckpt:
            ckpt.save_array("rows_a_sharded", pipe.packed_a)

    rows = ckpt.load_array("rows_b_sharded") if ckpt else None
    if rows is not None:
        pipe.packed_b = pipe._shard_rows(jnp.asarray(rows))
    else:
        pipe.run_pass2(mk())
        if ckpt:
            ckpt.save_array("rows_b_sharded", pipe.packed_b)

    loaded = ckpt.load_covariates() if ckpt else None
    if loaded is not None:
        pipe.cov.totals = loaded
    else:
        pipe.run_pass3(mk())
        if ckpt:
            ckpt.save_covariates(pipe.cov.totals)

    pipe.compute_recal_table()
    return pipe.run_pass4(mk())
