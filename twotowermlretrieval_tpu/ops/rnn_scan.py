"""Fused recurrent time-loop Pallas kernels (GRU / LSTM / RNN, fwd + bwd).

The XLA ``lax.scan`` recurrence (models/rnn.py) is latency-bound: every
timestep is a separate fusion with its own dispatch, and the backward adds
per-step cotangent streams through HBM. These kernels run the WHOLE time
loop inside one Mosaic program:

- the hidden (and LSTM cell) state lives in VMEM scratch across grid steps
  (never touches HBM between timesteps);
- the per-step input-projection blocks stream HBM->VMEM double-buffered by
  the grid pipeline;
- **the backward direction needs no flipped copies**: each direction gets
  its own BlockSpec index map (direction 0 reads time ``i``, direction 1
  reads time ``T-1-i``), so the caller passes original-time-order arrays
  and gets original-time-order outputs — zero stack/flip/concat traffic;
- the backward accumulates the recurrent weight gradient ``dW_hh`` and the
  bias gradient in VMEM scratch — the [D, H, G*H] cotangent never rides a
  scan carry and costs zero extra HBM traffic (XLA autodiff carries it
  through every reverse step);
- gate activations are recomputed in the backward from the saved state
  history (one extra MXU matmul for GRU/LSTM; none for vanilla RNN — the
  recurrence is latency-bound, not FLOP-bound).

Semantics are identical to the masked-update scan: padding steps are
identity (packed-sequence equivalence, ref: backend/model.py:55-57) and
gate math matches the ``torch.nn`` cell definitions.

Shape constraints (TPU tiling): H % 128 == 0 and B % 16 == 0; shapes whose
combined two-direction program exceeds scoped VMEM (H=1024+) run the SPLIT
plan — one program per direction with the weight gradient hoisted to an XLA
matmul (plan_fused; models/rnn.py:_fused_plan picks per shape). Everything
else falls back to the XLA scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from twotowermlretrieval_tpu.utils.dtypes import matmul_precision

_GATES = {"GRU": 3, "LSTM": 4, "RNN": 1}


def _mm(a, b, cdt):
    """[B, K] @ [K, N] -> [B, N] f32, operands cast to compute dtype."""
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )


def _outer_acc(h_prev, dg, cdt):
    """[H, B] @ [B, G*H] weight-gradient contribution on the MXU."""
    return jax.lax.dot_general(
        h_prev.astype(cdt), dg.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )


# direction -> time index maps. Direction 0 processes original time i at
# grid step i; direction 1 (the "backward" tower direction) processes
# original time T-1-i, so its inputs/outputs stay in original order with no
# flipped copies.


def _fwd_tmap(d: int, T: int, mask: bool = False):
    t = (lambda i: i) if d == 0 else (lambda i: T - 1 - i)
    if mask:
        return lambda b, i: (t(i), 0, b)
    return lambda b, i: (t(i), b, 0)


def _bwd_tmap(d: int, T: int, mask: bool = False):
    # reverse traversal of each direction's own processing order
    t = (lambda j: T - 1 - j) if d == 0 else (lambda j: j)
    if mask:
        return lambda b, j: (t(j), 0, b)
    return lambda b, j: (t(j), b, 0)


def _bwd_prev_tmap(d: int, T: int):
    # where the fused forward stored the direction's state at position p-1
    # (clamped; the kernel zero-overrides at the first position p == 0)
    if d == 0:
        return lambda b, j: (jnp.maximum(T - 2 - j, 0), b, 0)
    return lambda b, j: (jnp.minimum(j + 1, T - 1), b, 0)


_VMEM_BUDGET = 15 << 20  # calibrated against measured pass/fail shapes:
# the combined H=512/D=2/BB=64 program estimates 16.0 MB but ACTUALLY
# allocates 16.66 MB (measured round-4 compile failure), so the combined
# budget sits below the 16 MB scoped default by that margin — boundary
# shapes route to the split plan instead


def _bwd_vmem_bytes(BB: int, H: int, GH: int, D: int, cdt_bytes: int) -> int:
    """Rough VMEM footprint of the backward kernel at row-block BB: resident
    weights + gradient scratch + double-buffered per-step blocks. Calibrated
    empirically (H=256/BB<=256 and H=512/BB=64 compile and run; H=1024 and
    H=256 at 512 unblocked rows OOM the scoped limit)."""
    weights = 2 * D * H * GH * cdt_bytes  # w_hh + w_hh^T
    grads = D * H * GH * 4 + D * GH * 4  # dw/db scratch
    blocks = 2 * D * BB * (2 * GH * cdt_bytes + 3 * H * 4)  # xp, dxp, h/dout/c views
    scratch = 2 * D * BB * H * 4  # dh (+ dc)
    return weights + grads + blocks + scratch


def _bwd_split_vmem_bytes(BB: int, H: int, GH: int, cdt_bytes: int) -> int:
    """Footprint of the SPLIT backward kernel (one direction, no in-VMEM
    weight-gradient accumulation, no transposed weight copy): what lets
    H=1024 towers stay on the fused path (VERDICT r3 #5). The weight
    gradient moves to one XLA [H, T*B] x [T*B, GH] matmul outside."""
    weights = 2 * H * GH * cdt_bytes  # w_hh (Mosaic double-buffers it too)
    # xp in + dxp/dhp out (cdt) and hprev/dout/c views (f32), double-buffered
    blocks = 2 * BB * (3 * GH * cdt_bytes + 3 * H * 4)
    scratch = 2 * BB * H * 4  # dh (+ dc)
    return weights + blocks + scratch


def _candidate_blocks(B: int):
    candidates = []
    if B % 16 == 0 and B <= 256:
        candidates.append(B)  # single block: every view equals the full dim
    candidates += [bb for bb in (256, 128) if B % bb == 0]
    return candidates


def pick_b_block(B: int, H: int = 256, GH: int = 768, D: int = 2, cdt_bytes: int = 2) -> int:
    """Row-block size for the (B_blocks, T) grid, or 0 when no valid block
    exists (callers fall back to the XLA scan or the split plan).

    Constraints: divides B; fits the scoped-VMEM budget (estimated for the
    heavier backward kernel); and — because the mask view's block puts rows
    in the LANE dimension — either a multiple of 128 or equal to the full
    B (Mosaic requires last-dim blocks of 128k or the whole axis).
    """
    for bb in _candidate_blocks(B):
        if _bwd_vmem_bytes(bb, H, GH, D, cdt_bytes) <= _VMEM_BUDGET:
            return bb
    return 0


def _bwd_hoisted_vmem_bytes(BB: int, H: int, GH: int, D: int, cdt_bytes: int) -> int:
    """Footprint of the combined-direction HOISTED backward kernel: no
    [D, H, GH] f32 gradient scratch, no transposed-weight copy, one extra
    GH-wide output block per direction (the emitted dhp stream) — i.e.
    exactly D copies of the per-direction SPLIT kernel's footprint, so
    calibration fixes to that estimate propagate here automatically."""
    return D * _bwd_split_vmem_bytes(BB, H, GH, cdt_bytes)


def pick_b_block_hoisted(B: int, H: int, GH: int, D: int, cdt_bytes: int = 2) -> int:
    """Row block for the combined-direction hoisted-dw plan, or 0."""
    for bb in _candidate_blocks(B):
        if _bwd_hoisted_vmem_bytes(bb, H, GH, D, cdt_bytes) <= _VMEM_BUDGET:
            return bb
    return 0


def pick_b_block_split(B: int, H: int, GH: int, cdt_bytes: int = 2) -> int:
    """Row block for the per-direction SPLIT plan, or 0 (judged against
    the raised _SPLIT_VMEM_MB ceiling its programs compile under)."""
    for bb in _candidate_blocks(B):
        if _bwd_split_vmem_bytes(bb, H, GH, cdt_bytes) <= _SPLIT_VMEM_BUDGET:
            return bb
    return 0


# Scoped-VMEM ceiling for the split plan's programs: Mosaic double-buffers
# even the constant-index resident weight block, so wide towers need more
# than the 16 MB compiler default (H=1024 GRU bwd measured 18.9 MB). The
# chip has 128 MiB of physical VMEM; 40 MB leaves ample pipeline headroom.
_SPLIT_VMEM_MB = 40
_SPLIT_VMEM_BUDGET = _SPLIT_VMEM_MB << 20


def plan_fused(B: int, H: int, GH: int, D: int, cdt_bytes: int = 2) -> Optional[str]:
    """Which fused execution plan covers this shape:

    'fused' — both directions in ONE program, weight grads accumulated in
              VMEM scratch (the fast path; covers the reference's H=256
              and up to ~H=512 bidirectional);
    'split' — one program PER DIRECTION with the weight gradient hoisted
              to an XLA matmul (covers H=1024+, whose resident weights +
              gradient scratch exceed scoped VMEM);
    None    — no valid plan; callers use the XLA scan.
    """
    if H % 128 != 0:
        return None
    if pick_b_block(B, H, GH, D, cdt_bytes):
        return "fused"
    if pick_b_block_split(B, H, GH, cdt_bytes):
        return "split"
    return None


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, cell: str, n_dir: int, cdt, hist_dtype=jnp.float32):
    # refs: xp_0..xp_{D-1}, m_0..m_{D-1}, w_hh, b_hh,
    #       out_0..out_{D-1}, [c_0..c_{D-1} if LSTM], h_final,
    #       h_scr, [c_scr if LSTM]
    lstm = cell == "LSTM"
    i = 0
    xp_refs = refs[i : i + n_dir]; i += n_dir
    m_refs = refs[i : i + n_dir]; i += n_dir
    w_ref, b_ref = refs[i], refs[i + 1]; i += 2
    out_refs = refs[i : i + n_dir]; i += n_dir
    c_refs = refs[i : i + n_dir] if lstm else (); i += n_dir if lstm else 0
    hfinal_ref = refs[i]; i += 1
    h_scr = refs[i]; i += 1
    c_scr = refs[i] if lstm else None

    step = pl.program_id(1)  # grid = (B_blocks, T); T iterates fastest
    num_steps = pl.num_programs(1)

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        if lstm:
            c_scr[:] = jnp.zeros_like(c_scr)

    for d in range(n_dir):  # static unroll (D <= 2)
        h_prev = h_scr[d]  # [B, H] f32
        H = h_prev.shape[-1]
        xp = xp_refs[d][0].astype(jnp.float32)  # [B, G*H]
        m = m_refs[d][0, 0][:, None]  # [B, 1]

        if cell == "RNN":
            # no hp bias split needed: single gate
            hp = _mm(h_prev, w_ref[d], cdt) + b_ref[d][None, :]
            h_new = jnp.tanh(xp + hp)
        elif cell == "GRU":
            hp = _mm(h_prev, w_ref[d], cdt) + b_ref[d][None, :]
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
            n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
            h_new = (1.0 - z) * n + z * h_prev
        else:  # LSTM
            c_prev = c_scr[d]
            hp = _mm(h_prev, w_ref[d], cdt) + b_ref[d][None, :]
            g_all = xp + hp
            i_g = jax.nn.sigmoid(g_all[:, :H])
            f_g = jax.nn.sigmoid(g_all[:, H : 2 * H])
            g_g = jnp.tanh(g_all[:, 2 * H : 3 * H])
            o_g = jax.nn.sigmoid(g_all[:, 3 * H :])
            c_new = f_g * c_prev + i_g * g_g
            h_new = o_g * jnp.tanh(c_new)
            c = m * c_new + (1.0 - m) * c_prev
            c_scr[d] = c
            c_refs[d][0] = c.astype(hist_dtype)

        h = m * h_new + (1.0 - m) * h_prev
        h_scr[d] = h
        out_refs[d][0] = h.astype(hist_dtype)

    @pl.when(step == num_steps - 1)
    def _fin():
        hfinal_ref[:] = h_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("cell", "compute_dtype", "interpret", "b_block",
                     "directions", "vmem_limit_mb", "history_in_cdt"),
)
def rnn_layer_fwd(
    cell: str,
    xps: Sequence[jax.Array],  # per-direction [T, B, G*H] f32, original time order
    mask: jax.Array,  # [T, B] f32 (shared; per-direction views via index maps)
    w_hh: jax.Array,  # [D, H, G*H] f32
    b_hh: jax.Array,  # [D, G*H] f32
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
    b_block: int = 0,  # 0 = auto (largest <=256 divisor of B)
    vmem_limit_mb: int = 0,  # 0 = compiler default (16 MB scoped); the
    # split plan raises it — Mosaic double-buffers even the constant-index
    # weight block, so wide towers need headroom beyond the default
    directions: Optional[Tuple[int, ...]] = None,  # absolute direction per
    # entry of xps (default 0..D-1); the 'split' plan passes (1,) to run
    # the backward tower direction as its own one-direction program
    history_in_cdt: bool = False,  # store the saved state HISTORY (outs,
    # c_hist — the tensors the backward re-reads) in the compute dtype
    # instead of f32, halving that HBM traffic in bf16; the carried state
    # and h_final stay f32 (measurement knob TTMR_RNN_HISTORY=cdt)
):
    """Fused recurrent layer forward.

    Returns (outs — per-direction [T, B, H] in ORIGINAL time order (f32,
    or the compute dtype under ``history_in_cdt``), c_hist — per-direction
    [T, B, H] (LSTM) or () — and h_final [D, B, H] f32)."""
    D = len(xps)
    dirs = directions or tuple(range(D))
    T, B, GH = xps[0].shape
    H = GH // _GATES[cell]
    cdt = jnp.dtype(compute_dtype)
    lstm = cell == "LSTM"
    hist_dtype = cdt if history_in_cdt else jnp.dtype(jnp.float32)
    mask3 = mask[:, None, :]  # [T, 1, B] so blocks are (1, 1, B)

    # Auto block selection: the combined-plan budget first; the split
    # budget only applies when the call actually IS a split-plan program —
    # one direction, compiled under the raised scoped-VMEM ceiling. A
    # two-direction call at a split-only shape must keep failing fast
    # (the pre-split behavior) rather than compile-OOM under the 16 MB
    # default.
    BB = b_block or (
        pick_b_block(B, H, GH, D, cdt.itemsize)
        or (
            pick_b_block_split(B, H, GH, cdt.itemsize)
            if D == 1 and (vmem_limit_mb << 20) >= _SPLIT_VMEM_BUDGET
            else 0
        )
    )
    if not BB or B % BB:
        raise ValueError(f"no valid B block for B={B}; caller should fall back")
    nb = B // BB
    n_state_outs = 2 * D if lstm else D
    results = pl.pallas_call(
        functools.partial(_fwd_kernel, cell=cell, n_dir=D, cdt=cdt,
                          hist_dtype=hist_dtype),
        grid=(nb, T),
        in_specs=[
            *[
                pl.BlockSpec((1, BB, GH), _fwd_tmap(dirs[d], T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *[
                pl.BlockSpec((1, 1, BB), _fwd_tmap(dirs[d], T, mask=True), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            pl.BlockSpec((D, H, GH), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # out_0..out_{D-1}, then (LSTM) c_0..c_{D-1}: position k uses
            # direction (k % D)'s time map
            *[
                pl.BlockSpec((1, BB, H), _fwd_tmap(dirs[k % D], T), memory_space=pltpu.VMEM)
                for k in range(n_state_outs)
            ],
            pl.BlockSpec((D, BB, H), lambda b, i: (0, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct((T, B, H), hist_dtype) for _ in range(n_state_outs)],
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((D, BB, H), jnp.float32)] * (2 if lstm else 1)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * B * H * GH,
            bytes_accessed=D * T * B * GH * cdt.itemsize + T * D * B * H * 4,
            transcendentals=3 * T * D * B * H,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb << 20)
            if vmem_limit_mb else None
        ),
        interpret=interpret,
    )(*[xp.astype(cdt) for xp in xps], *[mask3] * D, w_hh.astype(cdt), b_hh)
    outs = tuple(results[:D])
    c_hist = tuple(results[D : 2 * D]) if lstm else ()
    return outs, c_hist, results[n_state_outs]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _mm_wT(dhp, w, cdt):
    """[B, G*H] (x) [H, G*H] contracted over G*H -> [B, H]: the dh chain's
    dhp @ w^T WITHOUT a materialized transposed weight copy (the split
    plan's VMEM saver — the MXU contracts either orientation)."""
    return jax.lax.dot_general(
        dhp.astype(cdt), w.astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )


def _bwd_kernel(*refs, cell: str, n_dir: int, cdt, split: bool = False):
    # refs (split=False):
    #   xp_d*, m_d*, hprev_d*, [cprev_d* if LSTM], [hcur_d* if RNN],
    #   dout_d*, w_hh, wT, b_hh, dhf,
    #   dxp_d*, dw, db, dh_scr, [dc_scr if LSTM], dw_scr, db_scr
    # refs (split=True, one direction, no wT/dw/db and no grad scratch):
    #   xp, m, hprev, [cprev], [hcur], dout, w_hh, b_hh, dhf,
    #   dxp, [dhp if GRU], dh_scr, [dc_scr if LSTM]
    lstm = cell == "LSTM"
    rnn = cell == "RNN"
    i = 0
    xp_refs = refs[i : i + n_dir]; i += n_dir
    m_refs = refs[i : i + n_dir]; i += n_dir
    hprev_refs = refs[i : i + n_dir]; i += n_dir
    cprev_refs = refs[i : i + n_dir] if lstm else (); i += n_dir if lstm else 0
    hcur_refs = refs[i : i + n_dir] if rnn else (); i += n_dir if rnn else 0
    dout_refs = refs[i : i + n_dir]; i += n_dir
    if split:
        w_ref, b_ref, dhf_ref = refs[i : i + 3]; i += 3
        wT_ref = None
    else:
        w_ref, wT_ref, b_ref, dhf_ref = refs[i : i + 4]; i += 4
    dxp_refs = refs[i : i + n_dir]; i += n_dir
    if split:
        dhp_refs = refs[i : i + n_dir] if cell == "GRU" else ()
        i += n_dir if cell == "GRU" else 0
        dw_ref = db_ref = None
    else:
        dw_ref, db_ref = refs[i : i + 2]; i += 2
    dh_scr = refs[i]; i += 1
    dc_scr = refs[i] if lstm else None; i += 1 if lstm else 0
    if not split:
        dw_scr, db_scr = refs[i], refs[i + 1]

    def chain(dhp, d):
        # dh contribution through the recurrent weights
        if split:
            return _mm_wT(dhp, w_ref[d], cdt)
        return _mm(dhp, wT_ref[d], cdt)

    b_blk = pl.program_id(0)  # grid = (B_blocks, T); T iterates fastest
    num_blocks = pl.num_programs(0)
    step = pl.program_id(1)
    num_steps = pl.num_programs(1)
    # reversed traversal: the final grid step handles each direction's first
    # position, where the p-1 state is the true zero initial state (the
    # clamped index map loaded garbage there)
    is_first_pos = step == num_steps - 1

    @pl.when(step == 0)
    def _init():
        # dh/dc carries reset per B block; the weight-grad accumulators
        # run across ALL blocks and timesteps (init once, emit once)
        dh_scr[:] = dhf_ref[:]
        if lstm:
            dc_scr[:] = jnp.zeros_like(dc_scr)

        if not split:
            @pl.when(b_blk == 0)
            def _init_w():
                dw_scr[:] = jnp.zeros_like(dw_scr)
                db_scr[:] = jnp.zeros_like(db_scr)

    for d in range(n_dir):  # static unroll
        # history may be stored in the compute dtype (history_in_cdt);
        # promote to f32 for the gate/elementwise math
        h_prev = jnp.where(is_first_pos, 0.0, hprev_refs[d][0]).astype(jnp.float32)
        H = h_prev.shape[-1]
        xp = xp_refs[d][0].astype(jnp.float32)
        m = m_refs[d][0, 0][:, None]  # [B, 1]
        dh_t = dh_scr[d] + dout_refs[d][0]
        dh_new = dh_t * m
        dh_direct = dh_t * (1.0 - m)

        if cell == "GRU":
            hp = _mm(h_prev, w_ref[d], cdt) + b_ref[d][None, :]
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
            n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
            h_n = hp[:, 2 * H :]
            dz = dh_new * (h_prev - n)
            dn_pre = dh_new * (1.0 - z) * (1.0 - n * n)
            dr_pre = dn_pre * h_n * r * (1.0 - r)
            dz_pre = dz * z * (1.0 - z)
            dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
            dhp = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
            dh_scr[d] = chain(dhp, d) + dh_new * z + dh_direct
        elif cell == "LSTM":
            c_prev = jnp.where(is_first_pos, 0.0, cprev_refs[d][0]).astype(jnp.float32)
            dc_t = dc_scr[d]
            dc_new = dc_t * m
            dc_direct = dc_t * (1.0 - m)
            hp = _mm(h_prev, w_ref[d], cdt) + b_ref[d][None, :]
            g_all = xp + hp
            i_g = jax.nn.sigmoid(g_all[:, :H])
            f_g = jax.nn.sigmoid(g_all[:, H : 2 * H])
            g_g = jnp.tanh(g_all[:, 2 * H : 3 * H])
            o_g = jax.nn.sigmoid(g_all[:, 3 * H :])
            c_new = f_g * c_prev + i_g * g_g
            tanh_c = jnp.tanh(c_new)
            do = dh_new * tanh_c
            dc_new = dc_new + dh_new * o_g * (1.0 - tanh_c * tanh_c)
            dgates = jnp.concatenate(
                [
                    dc_new * g_g * i_g * (1.0 - i_g),
                    dc_new * c_prev * f_g * (1.0 - f_g),
                    dc_new * i_g * (1.0 - g_g * g_g),
                    do * o_g * (1.0 - o_g),
                ],
                axis=-1,
            )
            dxp = dhp = dgates
            dc_scr[d] = dc_new * f_g + dc_direct
            dh_scr[d] = chain(dhp, d) + dh_direct
        else:  # RNN: h_new == saved output wherever m==1; dh_new==0 elsewhere
            h_t = hcur_refs[d][0].astype(jnp.float32)
            dxp = dhp = dh_new * (1.0 - h_t * h_t)
            dh_scr[d] = chain(dhp, d) + dh_direct

        dxp_refs[d][0] = dxp.astype(cdt)
        if split:
            if cell == "GRU":
                dhp_refs[d][0] = dhp.astype(cdt)
        else:
            # In-VMEM weight-gradient accumulation: [H, B] @ [B, G*H] on MXU
            dw_scr[d] += _outer_acc(h_prev, dhp, cdt)
            db_scr[d] += jnp.sum(dhp, axis=0)

    if not split:
        @pl.when((step == num_steps - 1) & (b_blk == num_blocks - 1))
        def _fin():
            dw_ref[:] = dw_scr[:]
            db_ref[:] = db_scr[:]


@functools.partial(
    jax.jit, static_argnames=("cell", "compute_dtype", "interpret", "b_block")
)
def rnn_layer_bwd(
    cell: str,
    xps: Sequence[jax.Array],  # per-direction [T, B, G*H] f32
    mask: jax.Array,  # [T, B] f32
    w_hh: jax.Array,  # [D, H, G*H] f32
    b_hh: jax.Array,  # [D, G*H] f32
    outs: Sequence[jax.Array],  # per-direction [T, B, H] f32 forward history
    c_hist: Sequence[jax.Array],  # per-direction [T, B, H] (LSTM) or ()
    douts: Sequence[jax.Array],  # per-direction [T, B, H] f32 cotangents
    d_hfinal: jax.Array,  # [D, B, H] f32
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
    b_block: int = 0,  # 0 = auto (largest <=256 divisor of B)
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array]:
    """Fused recurrent layer backward.

    Returns (dxps — per-direction [T, B, G*H] f32 in original time order,
    dw_hh [D, H, G*H] f32, db_hh [D, G*H] f32)."""
    D = len(xps)
    T, B, GH = xps[0].shape
    H = GH // _GATES[cell]
    cdt = jnp.dtype(compute_dtype)
    lstm = cell == "LSTM"
    rnn = cell == "RNN"
    mask3 = mask[:, None, :]

    BB = b_block or pick_b_block(B, H, GH, D, cdt.itemsize)
    if not BB or B % BB:
        raise ValueError(f"no valid B block for B={B}; caller should fall back")
    nb = B // BB

    extra_in_specs = []
    extra_inputs = []
    if lstm:
        extra_in_specs += [
            pl.BlockSpec((1, BB, H), _bwd_prev_tmap(d, T), memory_space=pltpu.VMEM)
            for d in range(D)
        ]
        extra_inputs += list(c_hist)
    if rnn:
        extra_in_specs += [
            pl.BlockSpec((1, BB, H), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
            for d in range(D)
        ]
        extra_inputs += list(outs)

    scratch_shapes = [pltpu.VMEM((D, BB, H), jnp.float32)]
    if lstm:
        scratch_shapes.append(pltpu.VMEM((D, BB, H), jnp.float32))
    scratch_shapes += [
        pltpu.VMEM((D, H, GH), jnp.float32),
        pltpu.VMEM((D, GH), jnp.float32),
    ]

    results = pl.pallas_call(
        functools.partial(_bwd_kernel, cell=cell, n_dir=D, cdt=cdt),
        grid=(nb, T),
        in_specs=[
            *[
                pl.BlockSpec((1, BB, GH), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *[
                pl.BlockSpec((1, 1, BB), _bwd_tmap(d, T, mask=True), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *[
                pl.BlockSpec((1, BB, H), _bwd_prev_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *extra_in_specs,
            *[
                pl.BlockSpec((1, BB, H), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            pl.BlockSpec((D, H, GH), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH, H), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BB, H), lambda b, j: (0, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            *[
                pl.BlockSpec((1, BB, GH), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            pl.BlockSpec((D, H, GH), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct((T, B, GH), cdt) for _ in range(D)],
            jax.ShapeDtypeStruct((D, H, GH), jnp.float32),
            jax.ShapeDtypeStruct((D, GH), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * T * D * B * H * GH,
            bytes_accessed=2 * D * T * B * GH * cdt.itemsize + 2 * D * T * B * H * 4,
            transcendentals=3 * T * D * B * H,
        ),
        interpret=interpret,
    )(
        *[xp.astype(cdt) for xp in xps],
        *[mask3] * D,
        *outs,
        *extra_inputs,
        *douts,
        w_hh.astype(cdt),
        jnp.swapaxes(w_hh, 1, 2).astype(cdt),
        b_hh,
        d_hfinal,
    )
    dxps = tuple(r.astype(xps[0].dtype) for r in results[:D])
    return dxps, results[D], results[D + 1]


@functools.partial(
    jax.jit,
    static_argnames=("cell", "direction", "compute_dtype", "interpret",
                     "b_block", "vmem_limit_mb"),
)
def rnn_layer_bwd_split(
    cell: str,
    xp: jax.Array,  # [T, B, G*H] f32, original time order
    mask: jax.Array,  # [T, B] f32
    w_hh1: jax.Array,  # [1, H, G*H] f32 (one direction's weights)
    b_hh1: jax.Array,  # [1, G*H] f32
    out: jax.Array,  # [T, B, H] f32 forward history (this direction)
    c_hist1,  # [T, B, H] f32 (LSTM) or None
    dout: jax.Array,  # [T, B, H] f32 cotangents
    d_hfinal1: jax.Array,  # [1, B, H] f32
    direction: int = 0,
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
    b_block: int = 0,
    vmem_limit_mb: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Single-direction fused backward for the SPLIT plan (VERDICT r3 #5):
    no in-VMEM weight-gradient accumulation and no transposed-weight copy,
    which is what lets H=1024 towers stay fused (the combined kernel's
    resident weights + [D, H, G*H] f32 gradient scratch exceed scoped
    VMEM there — see _bwd_split_vmem_bytes).

    Returns (dxp [T, B, G*H], dhp [T, B, G*H]) in the compute dtype: dxp
    is the input-projection cotangent; dhp the RECURRENT pre-activation
    cotangent (they differ only in GRU's candidate gate). The caller
    computes dw = sum_t h_prev(t)^T dhp(t) and db = sum dhp as one XLA
    matmul over the [T*B] axis — cheap MXU work plus one streamed
    [T, B, G*H] tensor of HBM traffic.
    """
    T, B, GH = xp.shape
    H = GH // _GATES[cell]
    cdt = jnp.dtype(compute_dtype)
    lstm = cell == "LSTM"
    rnn = cell == "RNN"
    gru = cell == "GRU"
    mask3 = mask[:, None, :]
    d = direction

    BB = b_block or pick_b_block_split(B, H, GH, cdt.itemsize)
    if not BB or B % BB:
        raise ValueError(f"no valid split B block for B={B}")
    nb = B // BB

    extra_in_specs = []
    extra_inputs = []
    if lstm:
        extra_in_specs.append(
            pl.BlockSpec((1, BB, H), _bwd_prev_tmap(d, T), memory_space=pltpu.VMEM)
        )
        extra_inputs.append(c_hist1)
    if rnn:
        extra_in_specs.append(
            pl.BlockSpec((1, BB, H), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
        )
        extra_inputs.append(out)

    scratch_shapes = [pltpu.VMEM((1, BB, H), jnp.float32)]
    if lstm:
        scratch_shapes.append(pltpu.VMEM((1, BB, H), jnp.float32))

    n_outs = 2 if gru else 1
    results = pl.pallas_call(
        functools.partial(_bwd_kernel, cell=cell, n_dir=1, cdt=cdt, split=True),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, BB, GH), _bwd_tmap(d, T), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BB), _bwd_tmap(d, T, mask=True), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), _bwd_prev_tmap(d, T), memory_space=pltpu.VMEM),
            *extra_in_specs,
            pl.BlockSpec((1, BB, H), _bwd_tmap(d, T), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GH), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), lambda b, j: (0, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, GH), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
            for _ in range(n_outs)
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, GH), cdt) for _ in range(n_outs)],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * H * GH,
            bytes_accessed=3 * T * B * GH * cdt.itemsize + 2 * T * B * H * 4,
            transcendentals=3 * T * B * H,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb << 20)
            if vmem_limit_mb else None
        ),
        interpret=interpret,
    )(
        xp.astype(cdt), mask3, out, *extra_inputs, dout,
        w_hh1.astype(cdt), b_hh1, d_hfinal1,
    )
    dxp = results[0]
    dhp = results[1] if gru else results[0]
    return dxp, dhp


def _hoisted_weight_grad(out: jax.Array, dhp: jax.Array, direction: int, cdt):
    """(dw [H, G*H] f32, db [G*H] f32) for one direction from its emitted
    recurrent pre-activation cotangent stream: dw = sum_t h_prev(t)^T dhp(t)
    as ONE [H, T*B] x [T*B, G*H] MXU matmul. h_prev in original time order
    is the saved output shifted by the direction's processing order, and
    masked steps contribute zero (their gate cotangents are zero inside
    the kernel)."""
    H = out.shape[-1]
    if direction == 0:
        h_prev = jnp.concatenate([jnp.zeros_like(out[:1]), out[:-1]], axis=0)
    else:
        h_prev = jnp.concatenate([out[1:], jnp.zeros_like(out[:1])], axis=0)
    dhp2 = dhp.reshape(-1, dhp.shape[-1])
    hp2 = h_prev.reshape(-1, H)
    dw = jax.lax.dot_general(
        hp2.astype(cdt), dhp2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )
    db = jnp.sum(dhp2.astype(jnp.float32), axis=0)
    return dw, db


def rnn_layer_bwd_split_full(
    cell: str,
    xps: Sequence[jax.Array],
    mask: jax.Array,
    w_hh: jax.Array,  # [D, H, G*H]
    b_hh: jax.Array,  # [D, G*H]
    outs: Sequence[jax.Array],
    c_hist: Sequence[jax.Array],
    douts: Sequence[jax.Array],
    d_hfinal: jax.Array,  # [D, B, H]
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array]:
    """The whole SPLIT-plan backward: per-direction kernel calls + the
    hoisted weight/bias gradients (see _hoisted_weight_grad). Drop-in
    equivalent of rnn_layer_bwd for shapes whose combined program exceeds
    scoped VMEM (H=1024+)."""
    cdt = jnp.dtype(compute_dtype)
    dxps, dws, dbs = [], [], []
    for d in range(len(xps)):
        dxp, dhp = rnn_layer_bwd_split(
            cell, xps[d], mask, w_hh[d : d + 1], b_hh[d : d + 1],
            outs[d], c_hist[d] if c_hist else None, douts[d],
            d_hfinal[d : d + 1], direction=d, compute_dtype=compute_dtype,
            interpret=interpret, vmem_limit_mb=_SPLIT_VMEM_MB,
        )
        dw, db = _hoisted_weight_grad(outs[d], dhp, d, cdt)
        dws.append(dw)
        dbs.append(db)
        dxps.append(dxp.astype(xps[d].dtype))
    return tuple(dxps), jnp.stack(dws), jnp.stack(dbs)


@functools.partial(
    jax.jit, static_argnames=("cell", "compute_dtype", "interpret", "b_block")
)
def _bwd_hoisted_call(
    cell: str,
    xps: Sequence[jax.Array],  # per-direction [T, B, G*H] f32
    mask: jax.Array,  # [T, B] f32
    w_hh: jax.Array,  # [D, H, G*H] f32
    b_hh: jax.Array,  # [D, G*H] f32
    outs: Sequence[jax.Array],  # per-direction [T, B, H] f32
    c_hist: Sequence[jax.Array],  # per-direction [T, B, H] (LSTM) or ()
    douts: Sequence[jax.Array],  # per-direction [T, B, H] f32
    d_hfinal: jax.Array,  # [D, B, H] f32
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
    b_block: int = 0,
):
    """Both directions in ONE program with the weight gradient HOISTED
    (the `split=True` kernel body at n_dir=D): per timestep each direction
    issues only the gate-recompute matmul and the dh-chain contraction —
    the third per-step MXU matmul (`_outer_acc`) and its [D, H, G*H] f32
    scratch and transposed-weight copy are gone, traded for one streamed
    [T, B, G*H] dhp tensor per direction and one big XLA matmul outside.

    Returns (dxps, dhps) per direction in the compute dtype."""
    D = len(xps)
    T, B, GH = xps[0].shape
    H = GH // _GATES[cell]
    cdt = jnp.dtype(compute_dtype)
    lstm = cell == "LSTM"
    rnn = cell == "RNN"
    gru = cell == "GRU"
    mask3 = mask[:, None, :]

    BB = b_block or pick_b_block_hoisted(B, H, GH, D, cdt.itemsize)
    if not BB or B % BB:
        raise ValueError(f"no valid hoisted B block for B={B}")
    nb = B // BB

    extra_in_specs = []
    extra_inputs = []
    if lstm:
        extra_in_specs += [
            pl.BlockSpec((1, BB, H), _bwd_prev_tmap(d, T), memory_space=pltpu.VMEM)
            for d in range(D)
        ]
        extra_inputs += list(c_hist)
    if rnn:
        extra_in_specs += [
            pl.BlockSpec((1, BB, H), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
            for d in range(D)
        ]
        extra_inputs += list(outs)

    scratch_shapes = [pltpu.VMEM((D, BB, H), jnp.float32)]
    if lstm:
        scratch_shapes.append(pltpu.VMEM((D, BB, H), jnp.float32))

    n_outs = 2 * D if gru else D
    results = pl.pallas_call(
        functools.partial(_bwd_kernel, cell=cell, n_dir=D, cdt=cdt, split=True),
        grid=(nb, T),
        in_specs=[
            *[
                pl.BlockSpec((1, BB, GH), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *[
                pl.BlockSpec((1, 1, BB), _bwd_tmap(d, T, mask=True), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *[
                pl.BlockSpec((1, BB, H), _bwd_prev_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            *extra_in_specs,
            *[
                pl.BlockSpec((1, BB, H), _bwd_tmap(d, T), memory_space=pltpu.VMEM)
                for d in range(D)
            ],
            pl.BlockSpec((D, H, GH), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BB, H), lambda b, j: (0, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # dxp_0..dxp_{D-1}, then (GRU) dhp_0..dhp_{D-1}
            *[
                pl.BlockSpec((1, BB, GH), _bwd_tmap(k % D, T), memory_space=pltpu.VMEM)
                for k in range(n_outs)
            ],
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, GH), cdt) for _ in range(n_outs)],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * T * D * B * H * GH,
            bytes_accessed=3 * D * T * B * GH * cdt.itemsize + 2 * D * T * B * H * 4,
            transcendentals=3 * T * D * B * H,
        ),
        interpret=interpret,
    )(
        *[xp.astype(cdt) for xp in xps],
        *[mask3] * D,
        *outs,
        *extra_inputs,
        *douts,
        w_hh.astype(cdt),
        b_hh,
        d_hfinal,
    )
    dxps = tuple(results[:D])
    dhps = tuple(results[D : 2 * D]) if gru else dxps
    return dxps, dhps


def rnn_layer_bwd_hoisted(
    cell: str,
    xps: Sequence[jax.Array],
    mask: jax.Array,
    w_hh: jax.Array,  # [D, H, G*H]
    b_hh: jax.Array,  # [D, G*H]
    outs: Sequence[jax.Array],
    c_hist: Sequence[jax.Array],
    douts: Sequence[jax.Array],
    d_hfinal: jax.Array,  # [D, B, H]
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array]:
    """Drop-in equivalent of rnn_layer_bwd: one combined-direction program
    with hoisted weight gradients (see _bwd_hoisted_call)."""
    cdt = jnp.dtype(compute_dtype)
    dxps, dhps = _bwd_hoisted_call(
        cell, tuple(xps), mask, w_hh, b_hh, tuple(outs), tuple(c_hist),
        tuple(douts), d_hfinal, compute_dtype=compute_dtype, interpret=interpret,
    )
    dws, dbs = [], []
    for d in range(len(xps)):
        dw, db = _hoisted_weight_grad(outs[d], dhps[d], d, cdt)
        dws.append(dw)
        dbs.append(db)
    return (
        tuple(dxp.astype(xps[0].dtype) for dxp in dxps),
        jnp.stack(dws),
        jnp.stack(dbs),
    )
