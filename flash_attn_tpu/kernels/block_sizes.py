"""Kernel tiling configuration.

The reference picks its tiles with a hand-written dispatch table keyed on
(head_dim, seqlen_k, arch, dropout) (reference:
csrc/flash_attn/src/fmha_fprop_kernel_dispatch.cu:96-132 and the Python
mirror flash_attn/flash_attn_interface.py:8-14). On TPU the analogous knob
is a ``BlockSizes`` dataclass resolved at trace time: JAX specialization
replaces template dispatch.

Tiles must respect the TPU layout: the lane dimension is 128, so every
block size along seq dims is a multiple of 128 (the minimum useful tile).
"""

from __future__ import annotations

import dataclasses

MIN_BLOCK = 128
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the flash-attention kernels.

    Forward: grid cell = (block_q x block_k) score tile.
    Backward dKV: iterates q tiles per kv tile (block_q_dkv x block_k_dkv).
    Backward dQ:  iterates kv tiles per q tile (block_q_dq x block_k_dq).
    """

    block_q: int = 128
    block_k: int = 128
    block_q_dkv: int = 128
    block_k_dkv: int = 128
    block_q_dq: int = 128
    block_k_dq: int = 128
    # Forward MXU/VPU interleave: the (block_q x block_k) tile is processed
    # as q_chains independent sub-q online-softmax chains whose QK^T dots
    # are all issued before any softmax math, letting the VPU softmax of
    # one chain overlap the MXU streams of the others (measured ~1.45x on
    # v5e vs a single chain). Clamped at launch so block_q / q_chains stays
    # a multiple of 128. With the column-shaped m/l carry, 2 chains
    # measured best on interior blocks (512-row dots; fewer per-chain
    # boundaries), while the causal DIAGONAL still prefers 8
    # (q_chains_diag) for the finer causal skip.
    q_chains: int = 2
    # Chain count on causal DIAGONAL blocks, where chain j only attends key
    # columns [0, (j+1)*block_q/q_chains_diag): finer chains skip more of
    # the upper triangle (waste 1/(2*chains)), and measured v5e prefers the
    # finest (8 at bq=1024) on the diagonal even though interior blocks
    # prefer 4. Clamped at launch like q_chains.
    q_chains_diag: int = 8
    # Causal diagonal-block specialization (per-chain narrowed dots +
    # static triangular mask). Config-surfaced (not a module global) so
    # A/B harnesses get a fresh jit/Mosaic cache entry per setting.
    diag_specialization: bool = True
    # Triangular-grid interior kv order after the leading diagonal:
    # False = ascending (ik=0..iq-1, one backward jump mid-row), True =
    # descending (ik=iq-1..0, every mid-row kv fetch adjacent; the only
    # jump is at the row boundary). A/B'd round 5 (probe residual
    # hypothesis: tri-grid DMA locality).
    tri_descend: bool = False

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name in ("diag_specialization", "tri_descend"):
                continue
            if f.name in ("q_chains", "q_chains_diag"):
                if v < 1:
                    raise ValueError(f"{f.name}={v} must be >= 1")
                continue
            if v % MIN_BLOCK != 0:
                raise ValueError(f"{f.name}={v} must be a multiple of {MIN_BLOCK}")

    @classmethod
    def choose(
        cls,
        *,
        seq_len_q: int,
        seq_len_k: int,
        head_dim: int,
        dtype_bytes: int = 2,
        dropout: bool = False,
    ) -> "BlockSizes":
        """Heuristic tile chooser (the TPU analog of the reference's
        dispatch table). Larger q/k tiles amortize HBM traffic; the VMEM
        budget (~16 MiB arithmetic + double buffering) caps them.
        """
        d_pad = max(_round_up(head_dim, LANES), LANES)
        # Measured on v5e (benchmarks/bench_dev.py sweeps, S=4K d=128
        # causal): bq=1024/bk=1024 with 4 sub-q chains (256-row dots
        # interleaved with softmax) reaches ~140 TFLOP/s vs ~57 for the
        # naive 512/512 single-chain tiling. Large kv blocks amortize
        # per-step (m, l, acc) work; larger still loses to VMEM pressure
        # and causal-skip granularity.
        if d_pad <= 128:
            bq, bk = 1024, 1024
        else:
            bq, bk = 512, 1024
        bq = min(bq, _round_up(seq_len_q, MIN_BLOCK))
        bk = min(bk, _round_up(seq_len_k, MIN_BLOCK))
        # Backward tiles: the dkv kernel holds (k, v, dk, dv) tiles plus
        # per-chain recomputed score/dp tiles; smaller q tiles than fwd keep
        # VMEM in budget while kv tiles stay wide.
        bq_b = min(512, _round_up(seq_len_q, MIN_BLOCK))
        bk_b = min(1024 if d_pad <= 128 else 512,
                   _round_up(seq_len_k, MIN_BLOCK))
        return cls(
            block_q=bq,
            block_k=bk,
            block_q_dkv=bq_b,
            block_k_dkv=bk_b,
            block_q_dq=bq_b,
            block_k_dq=bk_b,
        )
