"""Ragged batches of 3D point clouds as a JAX pytree.

TPU-native redesign of the reference ``Pointclouds`` container
(/root/reference/pytorch3d_pointops/structures/point_structure.py:40-1420).

Design departures from the torch original, driven by XLA's static-shape world:

* The **padded representation is canonical**: ``points_padded (N, P, 3)`` plus
  ``num_points_per_cloud (N,)`` live on device and are what every op consumes.
  List and packed views are host-side conveniences computed lazily from the
  padded arrays (they require *concrete* lengths, so they are unavailable
  inside ``jit`` — by design: ragged shapes cannot be traced).
* ``Pointclouds`` is a **registered pytree**, so it can be passed through
  ``jit`` / ``grad`` / ``vmap`` / ``pjit`` directly and checkpointed with orbax.
  Leaves are the padded points, the lengths, and each feature channel.
* Like the reference (readme.md:13-14), features are an **open dict of named
  channels** ``{name: (N, P, C)}`` rather than fixed normals/colors slots.
* ``offset_`` / ``scale_`` keep the reference's in-place *names* but substitute
  fresh arrays functionally (JAX arrays are immutable); they also return self.

Mirrored API surface (reference file:line):
  points_list:389  get_features_list:408  features_list:430
  points_packed:506 get_features_packed:516 features_packed:530
  points_padded:581 get_features_padded:591 features_padded:605
  num_points_per_cloud:623 packed_to_cloud_idx:633 cloud_to_packed_first_idx:645
  padded_to_packed_idx:656 __getitem__:691 isempty:735 clone:744 detach:786
  to:828 extend:883 split:913 get_cloud:938 offset_:968 scale_:998
  update_padded:1025 inside_box:1102
Free functions: join_pointclouds_as_batch:1145, join_pointclouds_as_scene:1207,
  get_bounding_boxes:1247, offset:1268, scale:1282, subsample:1298,
  all_close:1373.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import utils as struct_utils

Array = jnp.ndarray


def _concrete(x) -> np.ndarray:
    """Fetch a concrete numpy view of an array; raises under tracing."""
    if isinstance(x, jax.core.Tracer):
        raise ValueError(
            "This Pointclouds method requires concrete (non-traced) lengths; "
            "it builds ragged host-side views which cannot exist inside jit. "
            "Use the padded representation + num_points_per_cloud on device."
        )
    return np.asarray(x)


def make_device(device) -> jax.Device:
    """Make an actual ``jax.Device`` from a device given as a string or
    device object (reference ``point_structure.py:20-38``).

    Strings take the platform[:index] form the reference uses — ``"cpu"``,
    ``"tpu:1"`` — with a bare platform name resolving to that platform's
    first device (the analog of the reference assigning the current CUDA
    device index).  Device objects pass through unchanged.
    """
    if isinstance(device, str):
        platform, _, idx = device.partition(":")
        devices = jax.devices(platform)
        i = int(idx) if idx else 0
        if i >= len(devices):
            raise ValueError(
                f"device index {i} out of range: {len(devices)} "
                f"{platform} device(s) available"
            )
        return devices[i]
    return device


class Pointclouds:
    """Batch of up-to-``P``-point clouds with named per-point feature channels.

    Construct from either:
      * a list of N arrays of shape ``(P_i, 3)`` (ragged), or
      * a padded array of shape ``(N, P, 3)`` (optionally with ``lengths``).
    ``features`` is an optional dict mapping names to the matching list /
    padded representation.
    """

    def __init__(self, points, features=None, lengths=None):
        self.equisized = False
        self._points_list = None
        self._features_list: Dict[str, List[Array]] = {}
        # Lazily computed packed caches.
        self._points_packed = None
        self._features_packed: Dict[str, Array] = {}
        self._packed_to_cloud_idx = None
        self._cloud_to_packed_first_idx = None
        self._padded_to_packed_idx = None

        if isinstance(points, (list, tuple)):
            points = [jnp.asarray(p) for p in points]
            self._points_list = list(points)
            self._N = len(points)
            if self._N > 0:
                for p in points:
                    if p.size > 0 and (p.ndim != 2 or p.shape[1] != 3):
                        raise ValueError("Clouds in list must be of shape Px3 or empty")
                lengths_np = np.array([int(p.shape[0]) for p in points], np.int32)
                self._P = int(lengths_np.max()) if self._N else 0
                self._num_points_per_cloud = jnp.asarray(lengths_np)
                self.equisized = len(np.unique(lengths_np)) == 1
                self._points_padded = struct_utils.list_to_padded(
                    [p.reshape(-1, 3).astype(jnp.float32) for p in points],
                    (self._P, 3),
                    pad_value=0.0,
                    equisized=self.equisized,
                )
            else:
                self._P = 0
                self._num_points_per_cloud = jnp.zeros((0,), jnp.int32)
                self._points_padded = jnp.zeros((0, 0, 3), jnp.float32)
        elif hasattr(points, "shape"):
            points = jnp.asarray(points)
            if points.ndim != 3 or points.shape[2] != 3:
                raise ValueError("Points tensor has incorrect dimensions.")
            self._points_padded = points
            self._N = points.shape[0]
            self._P = points.shape[1]
            if lengths is None:
                self._num_points_per_cloud = jnp.full((self._N,), self._P, jnp.int32)
                self.equisized = True
            else:
                self._num_points_per_cloud = jnp.asarray(lengths, jnp.int32)
                if not isinstance(
                    self._num_points_per_cloud, jax.core.Tracer
                ) and self._N > 0:
                    ls = np.asarray(self._num_points_per_cloud)
                    self.equisized = len(np.unique(ls)) == 1 if ls.size else True
        else:
            raise ValueError(
                "Points must be either a list or an array of shape (N, P, 3)."
            )

        # Parse features.
        self._features_padded: Dict[str, Array] = {}
        self._C: Dict[str, int] = {}
        if features is not None:
            if not isinstance(features, dict):
                raise ValueError(
                    "Features must be a dictionary with feature names as keys"
                )
            for name, data in features.items():
                if data is None:
                    continue
                if isinstance(data, (list, tuple)):
                    if len(data) != self._N:
                        raise ValueError(
                            "Points and auxiliary input must be the same length."
                        )
                    C = None
                    fixed = []
                    lengths_np = _concrete(self._num_points_per_cloud)
                    for p_i, d in zip(lengths_np, data):
                        if d is not None and d.ndim == 2 and (p_i > 0 or True):
                            if p_i > 0 and d.shape[0] != p_i:
                                raise ValueError(
                                    "A cloud has mismatched numbers of points and inputs"
                                )
                            if C is None:
                                C = int(d.shape[1])
                            elif C != d.shape[1]:
                                raise ValueError(
                                    "The clouds must have the same number of channels"
                                )
                            fixed.append(jnp.asarray(d))
                        else:
                            fixed.append(None)
                    if C is None:
                        continue
                    fixed = [
                        f if f is not None else jnp.zeros((0, C), jnp.float32)
                        for f in fixed
                    ]
                    self._features_list[name] = fixed
                    self._features_padded[name] = struct_utils.list_to_padded(
                        fixed, (self._P, C), pad_value=0.0, equisized=self.equisized
                    )
                    self._C[name] = C
                elif hasattr(data, "shape"):
                    data = jnp.asarray(data)
                    if data.ndim != 3:
                        raise ValueError(
                            "Auxiliary input tensor has incorrect dimensions."
                        )
                    if data.shape[0] != self._N:
                        raise ValueError("Points and inputs must be the same length.")
                    if data.shape[1] != self._P:
                        raise ValueError(
                            "Inputs tensor must have the right maximum number of "
                            "points in each cloud."
                        )
                    self._features_padded[name] = data
                    self._C[name] = int(data.shape[2])
                else:
                    raise ValueError(
                        "Features must be either a list or a padded array of "
                        "shape (batch_size, P, C)."
                    )

    # ------------------------------------------------------------------
    # Pytree protocol
    # ------------------------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self._features_padded.keys()))
        children = (
            self._points_padded,
            self._num_points_per_cloud,
            tuple(self._features_padded[n] for n in names),
        )
        aux = (names, self.equisized)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, equisized = aux
        points_padded, lengths, feats = children
        obj = cls.__new__(cls)
        obj._points_padded = points_padded
        obj._num_points_per_cloud = lengths
        obj._features_padded = dict(zip(names, feats))
        obj._C = {
            n: (f.shape[-1] if hasattr(f, "shape") and getattr(f, "ndim", 0) >= 1 else 0)
            for n, f in obj._features_padded.items()
        }
        obj._N = points_padded.shape[0] if hasattr(points_padded, "shape") else 0
        obj._P = (
            points_padded.shape[1]
            if hasattr(points_padded, "shape") and points_padded.ndim >= 2
            else 0
        )
        obj.equisized = equisized
        obj._points_list = None
        obj._features_list = {}
        obj._points_packed = None
        obj._features_packed = {}
        obj._packed_to_cloud_idx = None
        obj._cloud_to_packed_first_idx = None
        obj._padded_to_packed_idx = None
        return obj

    # ------------------------------------------------------------------
    # Basic properties
    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._N

    @property
    def valid(self) -> Array:
        """Bool array (N,): True where a cloud has a nonzero number of points."""
        return self._num_points_per_cloud > 0

    def isempty(self) -> bool:
        if self._N == 0:
            return True
        return bool((_concrete(self._num_points_per_cloud) == 0).all())

    def num_points_per_cloud(self) -> Array:
        return self._num_points_per_cloud

    # ------------------------------------------------------------------
    # Padded getters (device-native, jit-safe)
    # ------------------------------------------------------------------
    def points_padded(self) -> Array:
        return self._points_padded

    def get_features_padded(self, name: str) -> Optional[Array]:
        return self._features_padded.get(name)

    def features_padded(self) -> Dict[str, Array]:
        return self._features_padded

    # ------------------------------------------------------------------
    # List getters (host-side)
    # ------------------------------------------------------------------
    def points_list(self) -> List[Array]:
        if self._points_list is None:
            lengths = _concrete(self._num_points_per_cloud)
            self._points_list = [
                self._points_padded[i, : int(lengths[i])] for i in range(self._N)
            ]
        return self._points_list

    def get_features_list(self, name: str) -> Optional[List[Array]]:
        if name not in self._features_list:
            if name not in self._features_padded:
                return None
            lengths = _concrete(self._num_points_per_cloud)
            self._features_list[name] = [
                self._features_padded[name][i, : int(lengths[i])]
                for i in range(self._N)
            ]
        return self._features_list[name]

    def features_list(self) -> Dict[str, List[Array]]:
        return {
            name: self.get_features_list(name)
            for name in set(self._features_list) | set(self._features_padded)
        }

    # ------------------------------------------------------------------
    # Packed getters (host-side index construction, device gathers)
    # ------------------------------------------------------------------
    def _compute_packed(self):
        if self._points_packed is not None:
            return
        lengths = _concrete(self._num_points_per_cloud)
        if self._N == 0 or lengths.sum() == 0:
            self._points_packed = jnp.zeros((0, 3), jnp.float32)
            self._packed_to_cloud_idx = jnp.zeros((0,), jnp.int32)
            self._cloud_to_packed_first_idx = jnp.zeros(
                (max(self._N, 0),), jnp.int32
            )
            self._features_packed = {}
            return
        first = np.zeros(self._N, np.int32)
        first[1:] = np.cumsum(lengths[:-1])
        self._cloud_to_packed_first_idx = jnp.asarray(first)
        self._packed_to_cloud_idx = jnp.asarray(
            np.repeat(np.arange(self._N, dtype=np.int32), lengths)
        )
        gather_idx = self.padded_to_packed_idx()
        flat = self._points_padded.reshape(-1, 3)
        self._points_packed = flat[gather_idx]
        self._features_packed = {}
        for name, fp in self._features_padded.items():
            self._features_packed[name] = fp.reshape(-1, fp.shape[-1])[gather_idx]

    def points_packed(self) -> Array:
        self._compute_packed()
        return self._points_packed

    def get_features_packed(self, name: str) -> Optional[Array]:
        self._compute_packed()
        return self._features_packed.get(name)

    def features_packed(self) -> Dict[str, Array]:
        self._compute_packed()
        return self._features_packed

    def packed_to_cloud_idx(self) -> Array:
        self._compute_packed()
        return self._packed_to_cloud_idx

    def cloud_to_packed_first_idx(self) -> Array:
        self._compute_packed()
        return self._cloud_to_packed_first_idx

    def padded_to_packed_idx(self) -> Array:
        """Indices into the flattened padded points giving the packed points
        (reference point_structure.py:656-683)."""
        if self._padded_to_packed_idx is None:
            lengths = _concrete(self._num_points_per_cloud)
            if self._N == 0:
                self._padded_to_packed_idx = jnp.zeros((0,), jnp.int32)
            else:
                self._padded_to_packed_idx = jnp.asarray(
                    np.concatenate(
                        [
                            np.arange(int(v), dtype=np.int32) + i * self._P
                            for i, v in enumerate(lengths)
                        ]
                    )
                    if lengths.sum() > 0
                    else np.zeros((0,), np.int32)
                )
        return self._padded_to_packed_idx

    # ------------------------------------------------------------------
    # Batch ops
    # ------------------------------------------------------------------
    def __getitem__(self, index) -> "Pointclouds":
        features_dict = self.features_list()
        if isinstance(index, (int, np.integer)):
            idx_list = [int(index)]
        elif isinstance(index, slice):
            idx_list = list(range(self._N))[index]
        elif isinstance(index, list):
            idx_list = [int(i) for i in index]
        elif hasattr(index, "dtype"):
            index = np.asarray(index)
            if index.ndim != 1 or np.issubdtype(index.dtype, np.floating):
                raise IndexError(index)
            if index.dtype == bool:
                idx_list = list(np.nonzero(index)[0])
            else:
                idx_list = [int(i) for i in index]
        else:
            raise IndexError(index)

        points = [self.points_list()[i] for i in idx_list]
        features = {
            name: [flist[i] for i in idx_list]
            for name, flist in features_dict.items()
            if flist is not None
        }
        return self.__class__(points=points, features=features if features else None)

    def clone(self) -> "Pointclouds":
        new = self.__class__(
            points=jnp.array(self._points_padded),
            lengths=jnp.array(self._num_points_per_cloud),
            features={k: jnp.array(v) for k, v in self._features_padded.items()}
            or None,
        )
        new.equisized = self.equisized
        return new

    def detach(self) -> "Pointclouds":
        new = self.__class__(
            points=jax.lax.stop_gradient(self._points_padded),
            lengths=self._num_points_per_cloud,
            features={
                k: jax.lax.stop_gradient(v)
                for k, v in self._features_padded.items()
            }
            or None,
        )
        new.equisized = self.equisized
        return new

    def to(self, device, copy: bool = False) -> "Pointclouds":
        """Place all arrays on the given jax.Device (or sharding).

        Mirrors reference ``point_structure.py:828-875``: with ``copy=False``
        (the default) and every array already resident on ``device``, ``self``
        is returned unchanged; otherwise a new object is built.  (Arrays are
        immutable in JAX, so the copy flag only controls object identity.)
        Strings resolve via ``make_device`` ("cpu", "tpu:0", ...) exactly
        like the reference's str-or-device contract.
        """
        if isinstance(device, str):
            device = make_device(device)
        if not copy:
            arrays = [self._points_padded, self._num_points_per_cloud]
            arrays += list(self._features_padded.values())
            try:
                if all(
                    getattr(a, "devices", lambda: set())() == {device}
                    for a in arrays
                ):
                    return self
            except (AttributeError, TypeError):
                pass  # sharding targets / non-committed arrays: rebuild
        new = self.__class__(
            points=jax.device_put(self._points_padded, device),
            lengths=jax.device_put(self._num_points_per_cloud, device),
            features={
                k: jax.device_put(v, device) for k, v in self._features_padded.items()
            }
            or None,
        )
        new.equisized = self.equisized
        return new

    def cpu(self) -> "Pointclouds":
        """Move all arrays to the host CPU (reference point_structure.py:877)."""
        return self.to(jax.devices("cpu")[0])

    def accelerator(self) -> "Pointclouds":
        """Move all arrays to the default accelerator — the TPU-native
        analog of the reference's ``cuda()`` (point_structure.py:880)."""
        return self.to(jax.devices()[0])

    def cuda(self) -> "Pointclouds":
        """Drop-in compatibility alias for ``accelerator()`` (reference
        point_structure.py:880): moves to the default accelerator, which
        here is the TPU rather than a CUDA device."""
        return self.accelerator()

    def extend(self, N: int) -> "Pointclouds":
        if not isinstance(N, int):
            raise ValueError("N must be an integer.")
        if N <= 0:
            raise ValueError("N must be > 0.")
        new_points = []
        for p in self.points_list():
            new_points.extend([p] * N)
        new_features = {}
        for name, flist in self.features_list().items():
            out = []
            for f in flist:
                out.extend([f] * N)
            new_features[name] = out
        return self.__class__(
            points=new_points, features=new_features if new_features else None
        )

    def split(self, split_sizes: list) -> List["Pointclouds"]:
        if not all(isinstance(x, int) for x in split_sizes):
            raise ValueError("Value of split_sizes must be a list of integers.")
        out = []
        cur = 0
        for s in split_sizes:
            out.append(self[cur : cur + s])
            cur += s
        return out

    def get_cloud(self, index: int):
        if not isinstance(index, (int, np.integer)):
            raise ValueError("Cloud index must be an integer.")
        if index < 0 or index >= self._N:
            raise ValueError("Cloud index must be in the range [0, N).")
        points = self.points_list()[index]
        features = {
            name: flist[index]
            for name, flist in self.features_list().items()
            if flist is not None
        }
        return points, features

    # ------------------------------------------------------------------
    # Geometry ops
    # ------------------------------------------------------------------
    def _mask(self) -> Array:
        """(N, P) bool validity mask from lengths."""
        return (
            jnp.arange(self._P, dtype=jnp.int32)[None, :]
            < self._num_points_per_cloud[:, None]
        )

    def offset_(self, offsets_packed: Array) -> "Pointclouds":
        """Translate the clouds; accepts (3,) or packed (sum(P_i), 3) offsets.

        Functional under the hood (new arrays), in-place in spirit: mutates
        this object's padded storage and invalidates caches.  Returns self.
        """
        offsets_packed = jnp.asarray(offsets_packed)
        mask = self._mask()[..., None]
        if offsets_packed.shape == (3,):
            off_padded = jnp.broadcast_to(
                offsets_packed, self._points_padded.shape
            )
        else:
            if offsets_packed.shape != self.points_packed().shape:
                raise ValueError("Offsets must have dimension (all_p, 3).")
            flat = jnp.zeros(
                (self._N * self._P, 3), offsets_packed.dtype
            ).at[self.padded_to_packed_idx()].set(offsets_packed)
            off_padded = flat.reshape(self._N, self._P, 3)
        self._set_points_padded(
            jnp.where(mask, self._points_padded + off_padded, self._points_padded)
        )
        return self

    def scale_(self, scale) -> "Pointclouds":
        """Scale cloud coordinates by a scalar or per-cloud (N,) factors."""
        if not hasattr(scale, "shape") or getattr(scale, "ndim", 0) == 0:
            scale = jnp.full((len(self),), scale, jnp.float32)
        scale = jnp.asarray(scale)
        mask = self._mask()[..., None]
        self._set_points_padded(
            jnp.where(
                mask,
                self._points_padded * scale[:, None, None],
                self._points_padded,
            )
        )
        return self

    def _set_points_padded(self, new_padded: Array):
        self._points_padded = new_padded
        self._points_list = None
        self._points_packed = None

    def update_padded(
        self, new_points_padded: Array, new_features_padded=None
    ) -> "Pointclouds":
        """Cheap functional update of the padded points (and optionally the
        features), reusing the auxiliary index tensors
        (reference point_structure.py:1025-1100).  Features not re-supplied
        are kept; supplying a features dict replaces the whole dict."""

        def check_shapes(x, size):
            if x.shape[0] != size[0]:
                raise ValueError("new values must have the same batch dimension.")
            if x.shape[1] != size[1]:
                raise ValueError("new values must have the same number of points.")
            if size[2] is not None and x.shape[2] != size[2]:
                raise ValueError("new values must have the same number of channels.")

        check_shapes(new_points_padded, [self._N, self._P, 3])
        if new_features_padded is not None:
            if not isinstance(new_features_padded, dict):
                raise ValueError("new_features_padded must be a dictionary")
            for name, f in new_features_padded.items():
                check_shapes(f, [self._N, self._P, self._C.get(name)])

        new = self.__class__(
            points=new_points_padded,
            lengths=self._num_points_per_cloud,
            features=new_features_padded
            if new_features_padded is not None
            else (self._features_padded or None),
        )
        new.equisized = self.equisized
        new._packed_to_cloud_idx = self._packed_to_cloud_idx
        new._cloud_to_packed_first_idx = self._cloud_to_packed_first_idx
        new._padded_to_packed_idx = self._padded_to_packed_idx
        return new

    def inside_box(self, box: Array) -> Array:
        """Bool (sum(P_i),) mask of packed points inside an axis-aligned box.

        ``box`` is (2, 3) or (N, 2, 3) with [min; max] rows
        (reference point_structure.py:1102-1142)."""
        box = jnp.asarray(box)
        if box.ndim > 3 or box.ndim < 2:
            raise ValueError("Input box must be of shape (2, 3) or (N, 2, 3).")
        if box.ndim == 3 and box.shape[0] != 1 and box.shape[0] != self._N:
            raise ValueError("Input box dimension is incompatible with pointcloud size.")
        if box.ndim == 2:
            box = box[None]
        if bool((_concrete(box)[..., 0, :] > _concrete(box)[..., 1, :]).any()):
            raise ValueError("Input box is invalid: min values larger than max values.")

        points_packed = self.points_packed()
        if box.shape[0] == 1:
            box_per_point = jnp.broadcast_to(
                box, (points_packed.shape[0], 2, 3)
            )
        else:
            box_per_point = box[self.packed_to_cloud_idx()]
        coord_inside = (points_packed >= box_per_point[:, 0]) & (
            points_packed <= box_per_point[:, 1]
        )
        return coord_inside.all(axis=-1)


jax.tree_util.register_pytree_node(
    Pointclouds,
    lambda pc: pc.tree_flatten(),
    Pointclouds.tree_unflatten,
)


# ----------------------------------------------------------------------
# Free functions
# ----------------------------------------------------------------------
def join_pointclouds_as_batch(pointclouds: Sequence[Pointclouds]) -> Pointclouds:
    """Concatenate several Pointclouds batches into one; a feature channel is
    kept only if present in every member (reference :1145-1204)."""
    if isinstance(pointclouds, Pointclouds) or not isinstance(pointclouds, Sequence):
        raise ValueError("Wrong first argument to join_points_as_batch.")
    points_list = [p for pc in pointclouds for p in pc.points_list()]

    all_dicts = [pc.features_list() for pc in pointclouds]
    names = set()
    for d in all_dicts:
        names.update(d.keys())
    combined = {}
    for name in names:
        feats = []
        ok = True
        for d in all_dicts:
            if name in d and d[name] is not None:
                feats.extend(d[name])
            else:
                ok = False
                break
        if ok:
            if feats and any(f.shape[1] != feats[0].shape[1] for f in feats[1:]):
                raise ValueError(
                    f"Pointclouds must have the same number of channels for "
                    f"feature '{name}'"
                )
            combined[name] = feats
    return Pointclouds(points=points_list, features=combined if combined else None)


def join_pointclouds_as_scene(
    pointclouds: Union[Pointclouds, List[Pointclouds]],
) -> Pointclouds:
    """Pack a batch (or list of batches) into a single-cloud Pointclouds
    (reference :1207-1240)."""
    if isinstance(pointclouds, list):
        pointclouds = join_pointclouds_as_batch(pointclouds)
    if len(pointclouds) == 1:
        return pointclouds
    points = pointclouds.points_packed()
    features = {
        name: f[None] for name, f in pointclouds.features_packed().items()
    }
    return Pointclouds(
        points=points[None], features=features if features else None
    )


def get_bounding_boxes(pointcloud: Pointclouds) -> Array:
    """(N, 3, 2) per-cloud axis-aligned min/max (reference :1247-1264).

    Device-native: computed from the padded rep with a lengths mask, so it is
    jit-safe (unlike the reference's list-based loop)."""
    pts = pointcloud.points_padded()
    mask = pointcloud._mask()[..., None]
    big = jnp.asarray(jnp.inf, pts.dtype)
    mins = jnp.min(jnp.where(mask, pts, big), axis=1)
    maxs = jnp.max(jnp.where(mask, pts, -big), axis=1)
    return jnp.stack([mins, maxs], axis=2)


def offset(pointcloud: Pointclouds, offsets_packed: Array) -> Pointclouds:
    """Out-of-place offset (reference :1268-1279)."""
    return pointcloud.clone().offset_(offsets_packed)


def scale(pointcloud: Pointclouds, scale) -> Pointclouds:
    """Out-of-place scale (reference :1282-1295)."""
    return pointcloud.clone().scale_(scale)


def subsample(
    pointclouds: Pointclouds,
    max_points: Union[int, Sequence[int]],
    seed: int = 0,
) -> Pointclouds:
    """Randomly subsample each cloud to at most ``max_points`` points, with
    matched feature selection (reference :1298-1370).  Host-side (ragged)."""
    if isinstance(max_points, int):
        max_points = [max_points] * len(pointclouds)
    elif len(max_points) != len(pointclouds):
        raise ValueError("wrong number of max_points supplied")
    lengths = np.asarray(_concrete(pointclouds.num_points_per_cloud()))
    if all(int(n) <= int(m) for n, m in zip(lengths, max_points)):
        return pointclouds

    rng = np.random.default_rng(seed)
    points_list = []
    all_features = pointclouds.features_list()
    features_out = {name: [] for name in all_features}
    for i, (max_, n_points, points) in enumerate(
        zip(map(int, max_points), map(int, lengths), pointclouds.points_list())
    ):
        if n_points > max_:
            keep = jnp.asarray(
                np.sort(rng.choice(n_points, max_, replace=False)).astype(np.int32)
            )
            points = points[keep]
            for name, flist in all_features.items():
                features_out[name].append(flist[i][keep])
        else:
            for name, flist in all_features.items():
                features_out[name].append(flist[i])
        points_list.append(points)
    features_out = {k: v for k, v in features_out.items() if v}
    return Pointclouds(
        points=points_list, features=features_out if features_out else None
    )


def all_close(
    pcd1: Pointclouds, pcd2: Pointclouds, rtol=1e-05, atol=1e-08, verbose=False
) -> bool:
    """True when two Pointclouds have allclose packed points and identical
    feature channel sets with allclose values (reference :1373-1420)."""
    points_all_close = bool(
        jnp.allclose(pcd1.points_packed(), pcd2.points_packed(), rtol, atol)
    )
    if verbose:
        print("Points all close:", points_all_close)
    if set(pcd1.features_packed().keys()) != set(pcd2.features_packed().keys()):
        if verbose:
            print(
                "Features keys mismatch:",
                pcd1.features_packed().keys(),
                pcd2.features_packed().keys(),
            )
        return False
    feats_close = {
        name: bool(
            jnp.allclose(
                pcd1.get_features_packed(name),
                pcd2.get_features_packed(name),
                rtol,
                atol,
            )
        )
        for name in pcd1.features_packed()
    }
    if verbose:
        print("Features all close:", feats_close)
    return points_all_close and all(feats_close.values())
