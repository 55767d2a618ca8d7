"""Key persistence: save/load PublicParameter + VerifierParameter.

The reference's nearest checkpoint/resume analog (SURVEY.md §5): its PC
benchmark serializes setup keys to the ``benchmark_cached_keys`` file with
``serialize_uncompressed`` and reloads them with ``deserialize_unchecked``
(reference: src/commitment/mod.rs:42-62). Equivalent here: the device-side
evaluation hypercubes are stored as raw limb arrays in one .npz (fast,
uncompressed — the cache use-case), host points as integer tuples.

Wire-format (compressed-point) serialization of the small VerifierParameter
is also provided for interop; pp hypercubes are cache-only by design (they
are O(n) G1/G2 points and never cross the wire in the protocol).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spartan_tpu.commitment.data_structures import PublicParameter, VerifierParameter
from spartan_tpu.ops.curve import PointBatch
from spartan_tpu.utils import serialize as ser


def save_keys(path: str, pp: PublicParameter, vp: VerifierParameter) -> None:
    arrs = {}
    for i, pb in enumerate(pp.powers_of_g):
        arrs[f"g{i}_x"] = np.asarray(pb.x)
        arrs[f"g{i}_y"] = np.asarray(pb.y)
        arrs[f"g{i}_z"] = np.asarray(pb.z)
    for i, pb in enumerate(pp.powers_of_h):
        for cname, coord in (("x", pb.x), ("y", pb.y), ("z", pb.z)):
            arrs[f"h{i}_{cname}0"] = np.asarray(coord[0])
            arrs[f"h{i}_{cname}1"] = np.asarray(coord[1])
    for i, pb in enumerate(pp.powers_of_h_comb or []):
        for cname, coord in (("x", pb.x), ("y", pb.y), ("z", pb.z)):
            arrs[f"hc{i}_{cname}0"] = np.asarray(coord[0])
            arrs[f"hc{i}_{cname}1"] = np.asarray(coord[1])
    meta = {
        "nv": pp.nv,
        # fmt 2: combined opening bases stored affine-normalized (the MSM
        # bucket walk relies on Z in {0,1} for its mixed adds)
        "fmt": 2,
        "g": [pp.g[0], pp.g[1]],
        "h": [[pp.h[0][0], pp.h[0][1]], [pp.h[1][0], pp.h[1][1]]],
        "g_mask": [[p[0], p[1]] for p in vp.g_mask_random],
    }
    arrs["meta"] = np.frombuffer(repr(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrs)


def load_keys(path: str):
    import ast

    data = np.load(path)
    meta = ast.literal_eval(bytes(data["meta"]).decode())
    nv = meta["nv"]
    powers_of_g, powers_of_h = [], []
    for i in range(nv):
        powers_of_g.append(
            PointBatch(
                jnp.asarray(data[f"g{i}_x"]),
                jnp.asarray(data[f"g{i}_y"]),
                jnp.asarray(data[f"g{i}_z"]),
            )
        )
        powers_of_h.append(
            PointBatch(
                (jnp.asarray(data[f"h{i}_x0"]), jnp.asarray(data[f"h{i}_x1"])),
                (jnp.asarray(data[f"h{i}_y0"]), jnp.asarray(data[f"h{i}_y1"])),
                (jnp.asarray(data[f"h{i}_z0"]), jnp.asarray(data[f"h{i}_z1"])),
            )
        )
    comb = []
    for i in range(nv):
        if f"hc{i}_x0" not in data:
            comb = None
            break
        comb.append(
            PointBatch(
                (jnp.asarray(data[f"hc{i}_x0"]), jnp.asarray(data[f"hc{i}_x1"])),
                (jnp.asarray(data[f"hc{i}_y0"]), jnp.asarray(data[f"hc{i}_y1"])),
                (jnp.asarray(data[f"hc{i}_z0"]), jnp.asarray(data[f"hc{i}_z1"])),
            )
        )
    if comb is not None and meta.get("fmt", 1) < 2:
        # pre-fmt-2 caches stored Jacobian combined bases; normalize once so
        # the mixed-add bucket walk's Z in {0,1} precondition holds
        from spartan_tpu.commitment import scheme as _scheme

        cat = jax.tree_util.tree_map(
            lambda *ls: jnp.concatenate(list(ls), axis=-1), *comb
        )
        catn = _scheme._normalize_g2(cat)
        out, off = [], 0
        for pb in comb:
            size = pb.x[0].shape[-1]
            out.append(
                jax.tree_util.tree_map(lambda a: a[..., off : off + size], catn)
            )
            off += size
        comb = out

    g = tuple(meta["g"])
    h = (tuple(meta["h"][0]), tuple(meta["h"][1]))
    pp = PublicParameter(
        nv=nv, powers_of_g=powers_of_g, powers_of_h=powers_of_h, g=g, h=h,
        powers_of_h_comb=comb,
    )
    vp = VerifierParameter(
        nv=nv, g=g, h=h, g_mask_random=[tuple(p) for p in meta["g_mask"]]
    )
    if comb is not None and meta.get("fmt", 1) < 2:
        try:  # upgrade the cache in place so the normalize pays only once
            save_keys(path, pp, vp)
        except OSError:
            pass
    return pp, vp


def ser_verifier_parameter(vp: VerifierParameter) -> bytes:
    """Canonical wire bytes for the (small) verifier parameter."""
    out = [ser.ser_u64(vp.nv), ser.ser_g1(vp.g), ser.ser_g2(vp.h)]
    out.append(ser.ser_u64(len(vp.g_mask_random)))
    out += [ser.ser_g1(p) for p in vp.g_mask_random]
    return b"".join(out)


def deser_verifier_parameter(data: bytes) -> VerifierParameter:
    off = 0
    nv = int.from_bytes(data[off : off + 8], "little")
    off += 8
    g, off = ser.deser_g1(data, off)
    h, off = ser.deser_g2(data, off)
    n = int.from_bytes(data[off : off + 8], "little")
    off += 8
    masks = []
    for _ in range(n):
        p, off = ser.deser_g1(data, off)
        masks.append(p)
    return VerifierParameter(nv=nv, g=g, h=h, g_mask_random=masks)
