"""Pallas-fused SMPL forward: blendshapes + LBS in one VMEM-resident kernel.

BASELINE north_star: "The entire SMPL forward ... fused into Pallas kernels
so mesh recovery is a single jit'd device program with no host round-trips."

Fusion analysis (what the kernel saves vs the XLA twin, SURVEY.md 3.3):
the XLA path materializes three (B, V, ...) HBM intermediates per body —
v_shaped, v_posed (each B*6890*3 f32) and the blended transform tensor T
(B*6890*16 f32, ~441 KB/body — the dominant traffic). The kernel computes
a vertex TILE of all of them in VMEM and writes only the final verts:

    per tile t (all batched over B in one MXU call each):
      v_posed[:, :, t] = template + coeffs (B,217) @ dirs (217, 3*T)  [MXU]
        where coeffs = [beta, vec(R)-I]; rows 0..9 of dirs = shapedirs,
        10..216 = posedirs -> shape and pose blendshapes are ONE matmul.
        dirs may be stored bf16 (prepare_fused_smpl(basis_dtype=...)),
        halving the kernel's dominant HBM stream at ~0.05 mm cost.
      T'     [:, :, t] = A^T (B*16, 24) @ weights^T (24, T)  [MXU]
      verts  [:, :, t] = affine-apply(T', v_posed)           [VPU]

Layout: coordinate-major (B, 3, Vp) with the vertex axis on lanes, padded
to Vp = 7168 (56*128); zero-padded weights/basis make padded verts exactly 0.

The kinematic chain (tiny, serial) and the joint regressions stay in XLA —
measured guidance from SURVEY.md section 7 "Hard parts".

Gradients: with concrete (host-prepared) params the LBS op differentiates
natively — Pallas forward AND Pallas backward (`_lbs_bwd_kernel`:
recompute-in-tile, grid-sequential reduction into the (coeffs, At)
cotangents). With traced params (jit-argument dicts) it falls back to an
op-level custom VJP whose backward is the XLA twin's vjp (identical math).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from human_3d_reconstruction_tpu.smpl.forward import (
    SMPLOutput,
    kinematic_chain,
    remove_rest_offset,
    resolve_parents,
    smpl_forward,
)
from human_3d_reconstruction_tpu.smpl.model_file import NUM_JOINTS
from human_3d_reconstruction_tpu.utils.geometry import rodrigues

_HI = jax.lax.Precision.HIGHEST

LANE = 128
VERT_TILE = 512  # vertices per grid step; VMEM/tile ~ 4 MB at B=64


def _pad_to(x: np.ndarray, n: int, axis: int) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return np.pad(x, pad)


def prepare_fused_smpl(
    params: dict, vert_tile: int = VERT_TILE, basis_dtype=np.float32
) -> dict:
    """One-time host-side repack of SMPL params for the fused kernel.

    Returns a dict of device-ready arrays:
      basis_template (1, 3, Vp)   v_template, vertex-lane layout, f32
      basis_dirs     (217, 3, Vp) [shapedirs; posedirs], basis_dtype
      weightsT       (24, Vp)     transposed skinning weights, zero-padded
      J_template (24, 3), J_shapedirs (24, 3, 10): rest-joint regression
          folded through the shape basis (avoids materializing v_shaped)
      joint_regressor (K, V) passthrough for posed-keypoint regression
      + original fields needed by the XLA stages.

    basis_dtype=jnp.bfloat16 halves the kernel's dominant HBM traffic (the
    18 MB basis read per call). Displacements are cm-scale, so bf16's
    ~2^-9 relative error costs ~0.05 mm — well inside the 1e-3 m parity
    bar but OUTSIDE the 2e-5 twin-equivalence bar, hence opt-in. The
    template row stays f32 (meter-scale values need the mantissa).
    """
    v_template = np.asarray(params["v_template"], np.float32)  # (V, 3)
    shapedirs = np.asarray(params["shapedirs"], np.float32)    # (V, 3, 10)
    posedirs = np.asarray(params["posedirs"], np.float32)      # (V, 3, 207)
    weights = np.asarray(params["weights"], np.float32)        # (V, 24)
    J_regressor = np.asarray(params["J_regressor"], np.float32)  # (24, V)

    V = v_template.shape[0]
    Vp = int(np.ceil(V / vert_tile)) * vert_tile
    assert Vp % LANE == 0, (Vp, LANE)

    # Template separately in f32 (meter-scale needs the mantissa); the
    # 217 blendshape-direction rows (cm-scale) in basis_dtype.
    basis_template = _pad_to(v_template.T[None], Vp, axis=2)  # (1, 3, Vp)
    basis_dirs = np.concatenate(
        [
            np.moveaxis(shapedirs, -1, 0).transpose(0, 2, 1),  # (10, 3, V)
            np.moveaxis(posedirs, -1, 0).transpose(0, 2, 1),   # (207, 3, V)
        ],
        axis=0,
    )
    basis_dirs = _pad_to(basis_dirs, Vp, axis=2).astype(basis_dtype)

    prepared = {
        "basis_template": jnp.asarray(basis_template),
        "basis_dirs": jnp.asarray(basis_dirs),
        "weightsT": jnp.asarray(_pad_to(weights.T, Vp, axis=1)),
        "J_template": jnp.asarray(J_regressor @ v_template),  # (24, 3)
        "J_shapedirs": jnp.asarray(
            np.einsum("jv,vcl->jcl", J_regressor, shapedirs)
        ),  # (24, 3, 10)
        "kintree_parents": np.asarray(params["kintree_parents"]),
        "num_verts": V,
        "vert_tile": vert_tile,
    }
    if "joint_regressor" in params:
        prepared["joint_regressor"] = jnp.asarray(params["joint_regressor"], jnp.float32)
    if "faces" in params:
        prepared["faces"] = np.asarray(params["faces"])
    return prepared


def _lbs_kernel(coeffs_ref, template_ref, dirs_ref, wT_ref, At_ref, out_ref):
    """One vertex tile: blendshapes + transform blend + affine apply."""
    n_dirs = dirs_ref.shape[0]            # 217
    tile = dirs_ref.shape[2]              # VERT_TILE
    B = coeffs_ref.shape[0]

    dirs2d = dirs_ref[:].reshape(n_dirs, 3 * tile)
    # Match coeff dtype to the basis so bf16 bases hit the MXU's native
    # bf16 x bf16 -> f32 path instead of a slow upcast-to-f32 matmul.
    coeffs = coeffs_ref[:].astype(dirs2d.dtype)
    disp = jnp.dot(
        coeffs, dirs2d, preferred_element_type=jnp.float32,
        precision=_HI if dirs2d.dtype == jnp.float32 else jax.lax.Precision.DEFAULT,
    )
    v_posed = (template_ref[:].reshape(1, 3 * tile) + disp).reshape(B, 3, tile)

    T = jnp.dot(
        At_ref[:], wT_ref[:], preferred_element_type=jnp.float32, precision=_HI
    ).reshape(B, 16, tile)

    x, y, z = v_posed[:, 0], v_posed[:, 1], v_posed[:, 2]
    ox = T[:, 0] * x + T[:, 1] * y + T[:, 2] * z + T[:, 3]
    oy = T[:, 4] * x + T[:, 5] * y + T[:, 6] * z + T[:, 7]
    oz = T[:, 8] * x + T[:, 9] * y + T[:, 10] * z + T[:, 11]
    out_ref[:] = jnp.stack([ox, oy, oz], axis=1)


def _lbs_pallas_call(
    coeffs: jax.Array,    # (B, 217)
    template: jax.Array,  # (1, 3, Vp) f32
    dirs: jax.Array,      # (217, 3, Vp) f32 or bf16
    weightsT: jax.Array,  # (24, Vp)
    At: jax.Array,        # (B*16, 24)
    vert_tile: int,
    interpret: bool,
) -> jax.Array:
    B = coeffs.shape[0]
    n_dirs, _, Vp = dirs.shape
    grid = (Vp // vert_tile,)
    dir_bytes = dirs.dtype.itemsize

    return pl.pallas_call(
        _lbs_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 3, Vp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, n_dirs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, vert_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_dirs, 3, vert_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((24, vert_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * 16, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, 3, vert_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_dirs * 3 * Vp + 2 * B * 16 * 24 * Vp + 9 * B * Vp,
            bytes_accessed=(
                dir_bytes * n_dirs * 3 * Vp
                + 4 * (3 * Vp + 24 * Vp + B * (n_dirs + 16 * 24 + 3 * Vp))
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coeffs, template, dirs, weightsT, At)


def _lbs_bwd_kernel(
    coeffs_ref, template_ref, dirs_ref, wT_ref, At_ref, g_ref,
    gcoeffs_ref, gAt_ref,
):
    """Backward of `_lbs_kernel`: cotangents for (coeffs, At).

    Recomputes the tile's v_posed and T (two cheap matmuls) instead of
    storing them, then reduces into the (grid-constant) output blocks —
    the TPU grid is sequential, so += accumulation across tiles is safe.
    """
    i = pl.program_id(0)
    n_dirs = dirs_ref.shape[0]
    tile = dirs_ref.shape[2]
    B = coeffs_ref.shape[0]

    dirs2d = dirs_ref[:].reshape(n_dirs, 3 * tile)
    coeffs = coeffs_ref[:].astype(dirs2d.dtype)
    prec = _HI if dirs2d.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    disp = jnp.dot(coeffs, dirs2d, preferred_element_type=jnp.float32, precision=prec)
    v_posed = (template_ref[:].reshape(1, 3 * tile) + disp).reshape(B, 3, tile)
    T = jnp.dot(
        At_ref[:], wT_ref[:], preferred_element_type=jnp.float32, precision=_HI
    ).reshape(B, 16, tile)

    g = g_ref[:]  # (B, 3, tile) cotangent of the output verts
    g0, g1, g2 = g[:, 0], g[:, 1], g[:, 2]
    x, y, z = v_posed[:, 0], v_posed[:, 1], v_posed[:, 2]

    # d/d v_posed: transpose of the affine apply.
    gx = T[:, 0] * g0 + T[:, 4] * g1 + T[:, 8] * g2
    gy = T[:, 1] * g0 + T[:, 5] * g1 + T[:, 9] * g2
    gz = T[:, 2] * g0 + T[:, 6] * g1 + T[:, 10] * g2
    g_vposed = jnp.stack([gx, gy, gz], axis=1).reshape(B, 3 * tile)

    # d/d T rows 0..11 (rows 12..15 are the constant homogeneous bottom row).
    ones_grad = [g0 * x, g0 * y, g0 * z, g0,
                 g1 * x, g1 * y, g1 * z, g1,
                 g2 * x, g2 * y, g2 * z, g2]
    zeros = jnp.zeros_like(g0)
    g_T = jnp.stack(ones_grad + [zeros] * 4, axis=1).reshape(B * 16, tile)

    # Reduce into grid-constant outputs.
    g_coeffs_tile = jax.lax.dot_general(
        g_vposed.astype(dirs2d.dtype), dirs2d,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (B, n_dirs)
    g_At_tile = jax.lax.dot_general(
        g_T, wT_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # (B*16, 24)

    @pl.when(i == 0)
    def _():
        gcoeffs_ref[:] = jnp.zeros_like(gcoeffs_ref)
        gAt_ref[:] = jnp.zeros_like(gAt_ref)

    gcoeffs_ref[:] += g_coeffs_tile
    gAt_ref[:] += g_At_tile


def _lbs_bwd_pallas_call(
    coeffs, template, dirs, weightsT, At, g, vert_tile: int, interpret: bool
):
    B = coeffs.shape[0]
    n_dirs, _, Vp = dirs.shape
    grid = (Vp // vert_tile,)

    return pl.pallas_call(
        _lbs_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, n_dirs), jnp.float32),
            jax.ShapeDtypeStruct((B * 16, 24), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, n_dirs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, vert_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_dirs, 3, vert_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((24, vert_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * 16, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, vert_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, n_dirs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * 16, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(coeffs, template, dirs, weightsT, At, g)


def _make_diff_lbs(
    template, dirs, weightsT, vert_tile: int, bwd_vert_tile: int, interpret: bool
):
    """Natively-differentiable fused LBS at its natural (coeffs, At)
    boundary: Pallas forward AND Pallas backward. Requires concrete
    (non-traced) param arrays — they are closed over as constants.

    The backward runs its own (smaller) tile: it keeps ~65% more live VMEM
    per tile than the forward (the g block, both accumulators, and the
    recomputed v_posed/T plus their cotangents), so the forward's tile can
    exceed the 16 MB scoped-vmem limit in the bwd kernel (hit at B=128)."""

    @jax.custom_vjp
    def op(coeffs, At):
        return _lbs_pallas_call(coeffs, template, dirs, weightsT, At, vert_tile, interpret)

    def fwd(coeffs, At):
        return op(coeffs, At), (coeffs, At)

    def bwd(res, g):
        coeffs, At = res
        return _lbs_bwd_pallas_call(
            coeffs, template, dirs, weightsT, At, g, bwd_vert_tile, interpret
        )

    op.defvjp(fwd, bwd)
    return op


def _fused_core(
    prepared: dict, pose: jax.Array, betas: jax.Array, interpret: bool,
    parents: list[int],
):
    """Shared trace: XLA chain stages + the Pallas tile kernel."""
    B = pose.shape[0]
    pose = jnp.asarray(pose, jnp.float32).reshape(B, NUM_JOINTS, 3)
    betas = jnp.asarray(betas, jnp.float32)

    rotations = rodrigues(pose)  # (B, 24, 3, 3)
    eye = jnp.eye(3, dtype=jnp.float32)
    pose_feature = (rotations[:, 1:] - eye).reshape(B, -1)  # (B, 207)

    # Rest joints straight from (beta) via the folded regressor.
    rest_joints = prepared["J_template"][None] + jnp.einsum(
        "jcl,bl->bjc", prepared["J_shapedirs"], betas,
        preferred_element_type=jnp.float32, precision=_HI,
    )  # (B, 24, 3)

    transforms = kinematic_chain(rotations, rest_joints, parents)
    A = remove_rest_offset(transforms, rest_joints)  # (B, 24, 4, 4)
    # A^T per body, stacked: (B, 16, 24) -> (B*16, 24).
    At = A.reshape(B, 24, 16).transpose(0, 2, 1).reshape(B * 16, 24)

    coeffs = jnp.concatenate([betas, pose_feature], axis=1)  # (B, 217)

    # Kernel batch chunking: above _MAX_KERNEL_BATCH bodies per call the
    # forward kernel's (B, 16, T) stack temporaries exceed the 16 MB scoped
    # VMEM even at the minimum legal 128-lane tile (B=512 measured 18.6 MB
    # on the v5e), so larger batches run as a lax.map over <=256-body
    # chunks — each chunk uses the proven tile table, and autodiff maps
    # chunk-wise through the custom-vjp op. Batches that don't divide
    # evenly are zero-padded to the next chunk multiple and sliced back
    # (pad rows cost dead FLOPs, never a different tile regime).
    Bk = min(B, _MAX_KERNEL_BATCH)

    if not isinstance(prepared["basis_dirs"], jax.core.Tracer):
        # Concrete params: fully-differentiable op (Pallas fwd + Pallas bwd);
        # the surrounding rodrigues/chain stages autodiff in XLA.
        op = _make_diff_lbs(
            prepared["basis_template"],
            prepared["basis_dirs"],
            prepared["weightsT"],
            _static_vert_tile(prepared, Bk),
            _static_vert_tile(prepared, Bk, backward=True),
            interpret,
        )
        kernel = op
    else:
        def kernel(c, a):
            return _lbs_pallas_call(
                c,
                prepared["basis_template"],
                prepared["basis_dirs"],
                prepared["weightsT"],
                a,
                _static_vert_tile(prepared, Bk),
                interpret,
            )  # (Bk, 3, Vp)

    if Bk == B:
        verts_cm = kernel(coeffs, At)
    else:
        n = -(-B // Bk)
        pad = n * Bk - B
        if pad:
            coeffs = jnp.concatenate([coeffs, jnp.zeros((pad, coeffs.shape[1]))])
            At = jnp.concatenate([At, jnp.zeros((pad * 16, 24))])
        verts_cm = jax.lax.map(
            lambda args: kernel(*args),
            (coeffs.reshape(n, Bk, -1), At.reshape(n, Bk * 16, 24)),
        ).reshape(n * Bk, 3, -1)[:B]
    return verts_cm, rotations, transforms, rest_joints


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _static_int(prepared: dict, key: str, default: int) -> int:
    """Read an int that must be concrete at trace time; fall back to the
    default when the params dict is a traced jit argument."""
    val = prepared.get(key)
    if val is None or isinstance(val, jax.core.Tracer):
        return default
    return int(val)


def _static_vert_tile(prepared: dict, batch: int, backward: bool = False) -> int:
    """Tile size: as large as VMEM allows for this batch.

    Forward per-tile VMEM ~= 4*T*(678 + 25*B) bytes (basis/template/weights
    blocks + the B-proportional in/out/temp blocks); the backward keeps
    ~4*T*(678 + 41*B) live (adds the g block, the recomputed v_posed/T AND
    their cotangents g_vposed/g_T — the (B,16,T) pairs dominate). Both are
    double-buffered by the grid pipeline; cap at ~11 MB of the 16 MB scoped
    budget (the B=128 backward measured 18.9 MB at T=512 — over the limit —
    and fits at T=256). Vp (a multiple of 512) divides every candidate.
    """
    Vp = prepared["basis_dirs"].shape[2]
    tile = _static_int(prepared, "vert_tile", default=VERT_TILE)
    if Vp % tile != 0:  # prepared with a custom tile that got traced away
        tile = VERT_TILE
    budget = 11 * 1024 * 1024
    per_b = 41 if backward else 25
    while tile > 128 and 4 * tile * (678 + per_b * batch) * 1.3 > budget:
        tile //= 2
    # Empirical large-batch cap (the analytic model underestimates Mosaic's
    # stack temporaries — the (B, 16, T) blend block spills at large B·T:
    # B=512/T=128 measured 18.6 MB against the model's 9 MB). tile*B <=
    # 64Ki fwd / 32Ki bwd matches every config measured good (B<=128
    # fwd@512, B=256 fwd@256/bwd@128). 128 is the minimum legal lane tile;
    # batches that would need less are chunked to _MAX_KERNEL_BATCH bodies
    # per kernel call in _fused_core.
    cap = 32768 if backward else 65536
    while tile > 128 and tile * batch > cap:
        tile //= 2
    assert Vp % tile == 0, (Vp, tile)
    return tile


# Above this many bodies per pallas_call the forward kernel cannot fit
# scoped VMEM at any legal tile (measured on v5e at B=512); _fused_core
# chunks the batch instead.
_MAX_KERNEL_BATCH = 256


def smpl_forward_fused(
    params: dict,
    pose: jax.Array,
    betas: jax.Array,
    trans: Optional[jax.Array] = None,
) -> SMPLOutput:
    """Drop-in replacement for `smpl_forward` using the Pallas kernel.

    `params` may be raw (`SMPLModel.as_dict()`) or pre-packed via
    `prepare_fused_smpl` (preferred: the repack then happens once on the
    host instead of inside every trace).

    Backward pass: delegates to the XLA twin's vjp (same math), so this op
    is safe inside the training loss; the kernel accelerates the forward.
    """
    prepared = params if "basis_dirs" in params else prepare_fused_smpl(params)
    parents = resolve_parents(prepared)
    interpret = _is_cpu()
    # Static metadata must not come from dict leaves (they become tracers
    # when the dict is a jit argument): derive from static shapes/constants.
    V = _static_int(prepared, "num_verts", default=6890)

    def forward(pose, betas):
        verts_cm, rotations, transforms, rest_joints = _fused_core(
            prepared, pose, betas, interpret, parents
        )
        return verts_cm, rotations, transforms, rest_joints

    def forward_ref(pose, betas):
        """XLA twin restricted to verts — used for the custom backward."""
        raw = {
            # Rebuild minimal raw params from the packed basis (exact same
            # numbers; slicing is free at trace time).
            "v_template": prepared["basis_template"][0, :, :V].T,
            "shapedirs": prepared["basis_dirs"][:10, :, :V].astype(jnp.float32).transpose(2, 1, 0),
            "posedirs": prepared["basis_dirs"][10:, :, :V].astype(jnp.float32).transpose(2, 1, 0),
            "weights": prepared["weightsT"][:, :V].T,
            "J_regressor": jnp.zeros((24, V), jnp.float32),  # unused: joints via folded regressor
        }
        # smpl_forward recomputes rest joints from J_regressor; we need the
        # folded version for identical math, so inline the twin here:
        B = pose.shape[0]
        p = jnp.asarray(pose, jnp.float32).reshape(B, NUM_JOINTS, 3)
        b = jnp.asarray(betas, jnp.float32)
        rotations = rodrigues(p)
        eye = jnp.eye(3, dtype=jnp.float32)
        pose_feature = (rotations[:, 1:] - eye).reshape(B, -1)
        rest_joints = prepared["J_template"][None] + jnp.einsum(
            "jcl,bl->bjc", prepared["J_shapedirs"], b,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        v_shaped = raw["v_template"][None] + jnp.einsum(
            "vcl,bl->bvc", raw["shapedirs"], b,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        v_posed = v_shaped + jnp.einsum(
            "vcp,bp->bvc", raw["posedirs"], pose_feature,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        transforms = kinematic_chain(rotations, rest_joints, parents)
        A = remove_rest_offset(transforms, rest_joints)
        T = jnp.einsum(
            "vj,bjpq->bvpq", raw["weights"], A,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        verts = (
            jnp.einsum(
                "bvpq,bvq->bvp", T[:, :, :3, :3], v_posed,
                preferred_element_type=jnp.float32, precision=_HI,
            )
            + T[:, :, :3, 3]
        )
        return verts

    if not isinstance(prepared["basis_dirs"], jax.core.Tracer):
        # Concrete params: _fused_core's LBS op already carries a Pallas
        # backward — the whole forward differentiates natively.
        verts_cm, *_ = forward(pose, betas)
        verts = verts_cm[:, :, :V].transpose(0, 2, 1)
    else:
        # Traced params (jit argument): fall back to an op-level custom VJP
        # whose backward is the XLA twin's vjp (identical math).
        @jax.custom_vjp
        def verts_op(pose, betas):
            verts_cm, *_ = forward(pose, betas)
            return verts_cm[:, :, :V].transpose(0, 2, 1)  # (B, V, 3)

        def verts_fwd(pose, betas):
            return verts_op(pose, betas), (pose, betas)

        def verts_bwd(res, g):
            pose, betas = res
            _, vjp = jax.vjp(forward_ref, pose, betas)
            return vjp(g)

        verts_op.defvjp(verts_fwd, verts_bwd)
        verts = verts_op(pose, betas)
    # Joints (cheap XLA stages; recomputed outside the custom_vjp so they
    # differentiate naturally).
    B = pose.shape[0]
    p = jnp.asarray(pose, jnp.float32).reshape(B, NUM_JOINTS, 3)
    b = jnp.asarray(betas, jnp.float32)
    rotations = rodrigues(p)
    rest_joints = prepared["J_template"][None] + jnp.einsum(
        "jcl,bl->bjc", prepared["J_shapedirs"], b,
        preferred_element_type=jnp.float32, precision=_HI,
    )
    transforms = kinematic_chain(rotations, rest_joints, parents)
    joints = transforms[:, :, :3, 3]

    if "joint_regressor" in prepared:
        eval_joints = jnp.einsum(
            "kv,bvc->bkc", prepared["joint_regressor"], verts,
            preferred_element_type=jnp.float32, precision=_HI,
        )
    else:
        eval_joints = joints

    if trans is not None:
        t = jnp.asarray(trans, jnp.float32)[:, None, :]
        verts = verts + t
        joints = joints + t
        eval_joints = eval_joints + t

    return SMPLOutput(
        verts=verts,
        joints=joints,
        eval_joints=eval_joints,
        rest_joints=rest_joints,
        rotations=rotations,
        transforms=transforms,
    )
