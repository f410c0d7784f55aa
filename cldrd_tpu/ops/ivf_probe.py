"""Fused IVF probe-and-score Pallas kernel.

The XLA lowering of the IVF probe step (``jnp.take`` of [B, nprobe]
bucket rows out of the [nb, slot*D] store, then cast + scoring einsum)
materializes the gathered candidate buffer in HBM and re-reads it:
measured on v5e at the full-corpus serving config (B=8, nprobe=32,
slot=2048, int8 store) the gather alone is 23.2 ms (402 MB moved at
~17 GB/s effective — 50x below HBM bandwidth), the int8->bf16 cast adds
~10 ms more, and together they are 33 of the 34.5 ms batch-1 latency
budget (`/tmp` stage decomposition reproduced in
``examples/bench_latency.py``). That defeats IVF's entire purpose — the
probe was supposed to be cheap because it touches nprobe*slot rows
instead of the corpus.

This kernel deletes the materialization: a scalar-prefetched index map
(``pltpu.PrefetchScalarGridSpec``) lets the pipeline's DMA engine stream
bucket ``probe[b, p]`` HBM->VMEM while the previous bucket is scoring,
each probed bucket is read EXACTLY once, the int8->bf16 cast happens on
registers in VMEM, and the [slot] score strip is emitted directly —
nothing but queries, scores, and per-row scales ever occupies HBM
bandwidth beyond the one mandatory pass over the probed rows.

Equivalence to the XLA path (same scores, same masking semantics) is
asserted by ``tests/test_ops.py`` in interpret mode on CPU; the IVF
index routes through this kernel exactly when it runs on TPU with
``precision='default'`` on a <=2-byte store
(``index/ivf_index.py::_probe_and_score``), the same gating policy as
the fused train-attention kernels.

Reference behavior being replaced: FAISS ``InvertedListScanner``'s
scan_codes over the probed lists (the reference consumes it via
``faiss.IndexIVFFlat`` search inside ``retriever/retrieval_utils.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_cq(c_ref, q_ref):
    """[slot] fp32 scores of one bucket against one query, on the MXU.
    Orientation matters to Mosaic: q [1, D] contracts with c [slot, D]
    along D so the WIDE slot dim lands on the output lanes ([1, slot]) —
    the natural TPU matvec layout. (The [slot, 1] orientation hit a
    Mosaic vector.broadcast verification error, and a 16-bit minor-dim
    insertion is unsupported outright.)"""
    c = c_ref[...].astype(jnp.bfloat16)               # [slot, D]
    q = q_ref[0].astype(jnp.bfloat16)                 # [1, D]
    s = jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [1, slot] f32
    return s[0]


def _kernel_scaled(probe_ref, q_ref, c_ref, sc_ref, out_ref):
    out_ref[0, 0, 0, :] = _dot_cq(c_ref, q_ref) * sc_ref[0, 0]


def _kernel_plain(probe_ref, q_ref, c_ref, out_ref):
    out_ref[0, 0, 0, :] = _dot_cq(c_ref, q_ref)


@functools.partial(jax.jit, static_argnames=("slot",))
def probe_scores(q, buckets_rows, probe, bucket_scales=None, *, slot: int):
    """Scores of every row in the probed buckets, streamed, fp32.

    q [B, D] (any float dtype), buckets_rows [nb*slot, D] ROW-layout
    store (bf16/fp32/int8 — cast to bf16 in VMEM; bucket j = rows
    j*slot:(j+1)*slot), probe [B, P] int32 bucket indices, bucket_scales
    [nb, slot] fp32 or None. Returns [B, P*slot] fp32 ==
    ``einsum('bd,bnd->bn', q, rows[probe-expanded]) * take(scales)`` at
    bf16 matmul precision (the store's own dtype for bf16/int8 stores —
    TPU 'default' precision rounds matmul inputs to bf16 anyway).

    The store MUST already be [nb*slot, D]: the bucket block is then a
    plain RECTANGULAR (slot, D) region whose dim-0 block index is the
    bucket id, which the DMA pipeline streams at HBM bandwidth (measured
    254 GB/s scattered). Reshaping a [nb, slot*D] store here instead
    would retile the WHOLE array inside every call (measured 20-140 ms
    at the 8.4M-row config — why IVFIndex keeps row layout on device).
    Singleton second-minor dims on q/scales/out satisfy the Mosaic block
    rule (second-minor block dim must divide 8 or equal the array dim).
    """
    b, d = q.shape
    p = probe.shape[1]
    buckets2 = buckets_rows
    q3 = q[:, None, :]                                # [B, 1, D]
    interpret = jax.default_backend() == "cpu"
    if bucket_scales is not None and bucket_scales.shape[1] == 0:
        bucket_scales = None
    common = dict(
        grid=(b, p),
        out_specs=pl.BlockSpec((1, 1, 1, slot),
                               lambda i, j, pr: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    q_spec = pl.BlockSpec((1, 1, d), lambda i, j, pr: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((slot, d), lambda i, j, pr: (pr[i, j], 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, p, 1, slot), jnp.float32)
    if bucket_scales is None:
        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, in_specs=[q_spec, c_spec], **common)
        out = pl.pallas_call(
            _kernel_plain,
            grid_spec=gridspec, out_shape=out_shape, interpret=interpret,
        )(probe, q3, buckets2)
    else:
        sc_spec = pl.BlockSpec((1, 1, slot), lambda i, j, pr: (pr[i, j], 0, 0),
                               memory_space=pltpu.VMEM)
        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, in_specs=[q_spec, c_spec, sc_spec],
            **common)
        out = pl.pallas_call(
            _kernel_scaled,
            grid_spec=gridspec, out_shape=out_shape, interpret=interpret,
        )(probe, q3, buckets2, bucket_scales[:, None, :])
    return out.reshape(b, p * slot)


def probe_scores_reference(q, buckets_rows, probe, bucket_scales=None, *,
                           slot: int):
    """The pure-XLA twin (row-gather + einsum — the CPU path's
    formulation), used by the equivalence tests."""
    b, d = q.shape
    p = probe.shape[1]
    rowix = (probe[:, :, None] * slot
             + jnp.arange(slot, dtype=probe.dtype)[None, None, :]
             ).reshape(b, p * slot)
    cand = jnp.take(buckets_rows, rowix, axis=0)
    if cand.dtype == jnp.int8:
        cand = cand.astype(q.dtype if q.dtype != jnp.int8 else jnp.bfloat16)
    scores = jnp.einsum("bd,bnd->bn", q, cand,
                        preferred_element_type=jnp.float32)
    if bucket_scales is not None and bucket_scales.shape[1]:
        sc = jnp.take(bucket_scales, probe, axis=0).reshape(b, p * slot)
        scores = scores * sc
    return scores
