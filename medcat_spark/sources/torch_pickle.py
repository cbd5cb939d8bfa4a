"""Pure-numpy reader/writer for PyTorch checkpoint files (``torch.save`` zip
format), so real MedCAT ``meta_*``/``rel_*`` model weights can be ingested
without torch in the environment.

A ``torch.save(state_dict, path)`` file (torch >= 1.6) is a zip archive::

    <root>/data.pkl      pickle of the state dict; tensors are encoded as
                         ``torch._utils._rebuild_tensor_v2(storage, offset,
                         size, stride, requires_grad, hooks)`` where the
                         storage is a pickle *persistent id*
                         ``('storage', <StorageType>, key, location, numel)``
    <root>/data/<key>    the raw little-endian storage bytes
    <root>/version       serialization version number

The reference saves MetaCAT weights exactly this way
(/root/reference/medcat/meta_cat.py:380-381 ``torch.save(
self.model.state_dict(), model.dat)``; loaded at meta_cat.py:428).

``read_state_dict`` re-implements the inverse with ``zipfile`` + a
restricted ``pickle.Unpickler`` whose ``find_class`` only materializes the
tensor-rebuild helpers (as numpy) and whose ``persistent_load`` reads the
raw storages — no torch import, no arbitrary code execution (anything
outside the allowlist loads as an inert stub).

``write_state_dict`` produces the same layout (used for test fixtures and
for exporting our trained analogues in a torch-loadable form).  Writing
pickles that *reference* torch globals without torch installed is done by
temporarily registering stub modules named ``torch``/``torch._utils`` in
``sys.modules`` for the duration of the dump.
"""

from __future__ import annotations

import io
import pickle
import sys
import types
import zipfile
from collections import OrderedDict
from typing import Dict, Tuple

import numpy as np

# torch storage class name -> numpy dtype (bfloat16 handled specially)
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # no numpy dtype; decoded via uint16 -> float32
}
_DTYPE_TO_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class _StorageType:
    """Stands in for ``torch.FloatStorage`` etc. during unpickling."""

    def __init__(self, name: str) -> None:
        self.name = name

    @property
    def dtype(self):
        return _STORAGE_DTYPES[self.name]


class _Storage:
    """A loaded raw storage: flat numpy array."""

    def __init__(self, array: np.ndarray) -> None:
        self.array = array


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_rest):
    """numpy analogue of ``torch._utils._rebuild_tensor_v2``.

    size/stride/offset come from the (untrusted) pickle stream, so they
    are bounds-checked against the actual storage before the
    ``as_strided`` view is built — otherwise a crafted checkpoint could
    make ``.copy()`` read arbitrary process memory or segfault, which
    would defeat the restricted ``find_class`` hardening."""
    arr = storage.array
    size = tuple(int(s) for s in size)
    storage_offset = int(storage_offset)
    if storage_offset < 0 or storage_offset > arr.size:
        raise ValueError(
            f"tensor storage_offset {storage_offset} outside storage "
            f"of {arr.size} elements")
    if not size:
        if storage_offset >= arr.size:
            raise ValueError("scalar tensor offset beyond storage end")
        return arr[storage_offset:storage_offset + 1].copy().reshape(())
    stride = tuple(int(s) for s in stride)
    if len(stride) != len(size):
        raise ValueError(f"stride rank {len(stride)} != size rank "
                         f"{len(size)}")
    if any(d < 0 for d in size) or any(s < 0 for s in stride):
        raise ValueError(
            f"negative size/stride in tensor header: size={size} "
            f"stride={stride}")
    if 0 in size:
        return np.empty(size, dtype=arr.dtype)
    # max reachable flat index (all strides non-negative)
    reach = storage_offset + sum((d - 1) * s
                                 for d, s in zip(size, stride)) + 1
    if reach > arr.size:
        raise ValueError(
            f"tensor view reaches element {reach} of a storage with "
            f"only {arr.size} elements (size={size}, stride={stride}, "
            f"offset={storage_offset})")
    itemsize = arr.dtype.itemsize
    strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=size, strides=strides)
    return view.copy()


def _rebuild_parameter(data, *_rest):
    """``torch._utils._rebuild_parameter`` — a Parameter is its tensor."""
    return data


class _Inert:
    """Catch-all for globals outside the allowlist (e.g. dtype objects,
    ``torch.device``): constructible, reducible, truthy, inert.  The
    pickled STATE (plain data after tolerant decoding) is kept on
    ``.state`` so callers can recover embedded data — e.g. the vocab
    inside a pickled HF tokenizer (reference_pack._load_trf_component).
    Class-level defaults matter: protocol-2 NEWOBJ bypasses __init__
    and pickle skips BUILD for falsy state."""

    args: tuple = ()
    state = None

    def __init__(self, *a, **k):
        self.args = a

    def __call__(self, *a, **k):
        return _Inert(*a)

    def __setstate__(self, state):
        self.state = state


class _StateDictUnpickler(pickle.Unpickler):
    def __init__(self, data_pkl: bytes, load_record) -> None:
        super().__init__(io.BytesIO(data_pkl))
        self._load_record = load_record

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        # anything else (torch.device, torch.dtype instances via
        # torch.serialization helpers, custom classes) -> inert stub
        return _Inert

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        if isinstance(pid, tuple) and pid and pid[0] == "storage":
            _, storage_type, key, _location, numel = pid
            name = storage_type.name if isinstance(storage_type, _StorageType) \
                else "FloatStorage"
            raw = self._load_record(str(key))
            if name == "BFloat16Storage":
                u16 = np.frombuffer(raw, dtype="<u2", count=int(numel))
                arr = (u16.astype(np.uint32) << 16).view(np.float32).copy()
            else:
                dtype = _STORAGE_DTYPES[name]
                arr = np.frombuffer(
                    raw, dtype=np.dtype(dtype).newbyteorder("<"),
                    count=int(numel)).copy()
            return _Storage(arr)
        return _Inert()


def read_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    """Read a ``torch.save``-format checkpoint into ``{name: ndarray}``.

    Non-tensor entries (if any) come back as inert stubs and are dropped.
    """
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl — not a torch zip checkpoint "
                             "(legacy tar/dill checkpoints are unsupported)")
        pkl_name = min(pkl_names, key=len)
        root = pkl_name[: -len("data.pkl")]

        def load_record(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        obj = _StateDictUnpickler(zf.read(pkl_name), load_record).load()
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in dict(obj).items():
        if isinstance(v, np.ndarray):
            out[str(k)] = v
    return out


# ---------------------------------------------------------------------------
# writer


class _FakeTensor:
    """Pickles exactly like a torch tensor inside a state dict."""

    def __init__(self, arr: np.ndarray, key: int) -> None:
        self.arr = arr
        self.key = key

    def __reduce__(self):
        mod = sys.modules["torch._utils"]
        strides = tuple(s // self.arr.dtype.itemsize for s in self.arr.strides)
        return (mod._rebuild_tensor_v2,
                (_FakeStorageRef(self.arr, self.key), 0,
                 tuple(self.arr.shape), strides, False, OrderedDict()))


class _FakeStorageRef:
    def __init__(self, arr: np.ndarray, key: int) -> None:
        self.arr = arr
        self.key = key


class _StateDictPickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _FakeStorageRef):
            storage_cls = getattr(
                sys.modules["torch"],
                _DTYPE_TO_STORAGE[obj.arr.dtype])
            return ("storage", storage_cls, str(obj.key), "cpu",
                    int(obj.arr.size))
        return None


class _fake_torch_modules:
    """Register stub ``torch`` / ``torch._utils`` modules so pickle can emit
    global references to them.  No-op teardown restores ``sys.modules``.
    Only used by the fixture/export writer; never at read time."""

    def __enter__(self):
        self._saved = {m: sys.modules.get(m) for m in ("torch", "torch._utils")}
        torch_mod = types.ModuleType("torch")
        utils_mod = types.ModuleType("torch._utils")

        def rebuild(*a, **k):  # placeholder target for the global ref
            raise RuntimeError("stub")
        rebuild.__module__ = "torch._utils"
        rebuild.__qualname__ = rebuild.__name__ = "_rebuild_tensor_v2"
        utils_mod._rebuild_tensor_v2 = rebuild
        for sname in _DTYPE_TO_STORAGE.values():
            cls = type(sname, (), {"__module__": "torch"})
            setattr(torch_mod, sname, cls)
        torch_mod._utils = utils_mod
        sys.modules["torch"] = torch_mod
        sys.modules["torch._utils"] = utils_mod
        return self

    def __exit__(self, *exc):
        for m, old in self._saved.items():
            if old is None:
                sys.modules.pop(m, None)
            else:
                sys.modules[m] = old
        return False


def write_state_dict(path: str, state: Dict[str, np.ndarray],
                     root: str = "archive") -> None:
    """Write ``{name: ndarray}`` as a ``torch.save``-format zip checkpoint.

    The result loads with real ``torch.load`` (same pickle opcodes and
    storage layout) and with :func:`read_state_dict`.
    """
    arrays: Dict[int, np.ndarray] = {}
    sd = OrderedDict()
    for i, (name, arr) in enumerate(state.items()):
        arr = np.asarray(arr)
        # ascontiguousarray promotes 0-d to 1-d; restore the true shape
        arr = np.ascontiguousarray(arr).reshape(arr.shape)
        if arr.dtype not in _DTYPE_TO_STORAGE:
            raise TypeError(f"unsupported dtype {arr.dtype} for {name}")
        arrays[i] = arr
        sd[name] = _FakeTensor(arr, i)

    buf = io.BytesIO()
    if "torch" in sys.modules and not isinstance(
            sys.modules["torch"], types.ModuleType):
        raise RuntimeError("unexpected torch module state")
    with _fake_torch_modules():
        _StateDictPickler(buf, protocol=2).dump(sd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", buf.getvalue())
        zf.writestr(f"{root}/version", "3\n")
        for key, arr in arrays.items():
            le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
            zf.writestr(f"{root}/data/{key}", le.tobytes())


# ---------------------------------------------------------------------------
# safetensors reader (the other format HF save_pretrained emits)

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_, "BF16": None,
}


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.safetensors`` file (published format: u64-LE header
    length, JSON header mapping tensor name -> {dtype, shape,
    data_offsets}, then the raw little-endian buffer)."""
    import json
    import struct
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
        base = 8 + hlen
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            dt = meta["dtype"]
            if dt not in _SAFETENSORS_DTYPES:
                raise ValueError(f"{path}: unsupported dtype {dt}")
            b0, b1 = meta["data_offsets"]
            f.seek(base + b0)
            raw = f.read(b1 - b0)
            if dt == "BF16":
                u16 = np.frombuffer(raw, dtype="<u2")
                arr = (u16.astype(np.uint32) << 16).view(np.float32).copy()
            else:
                dtype = np.dtype(_SAFETENSORS_DTYPES[dt]).newbyteorder("<")
                arr = np.frombuffer(raw, dtype=dtype).copy()
            out[name] = arr.reshape(meta["shape"])
    return out


def write_safetensors(path: str, state: Dict[str, np.ndarray]) -> None:
    """Inverse of :func:`read_safetensors` (fixtures/export)."""
    import json
    import struct
    inv = {np.dtype(v): k for k, v in _SAFETENSORS_DTYPES.items() if v}
    header: Dict[str, dict] = {}
    bufs = []
    off = 0
    for name, arr in state.items():
        arr = np.ascontiguousarray(np.asarray(arr)).reshape(
            np.asarray(arr).shape)
        dt = inv.get(arr.dtype)
        if dt is None:
            raise TypeError(f"unsupported dtype {arr.dtype} for {name}")
        raw = arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
        header[name] = {"dtype": dt, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        bufs.append(raw)
        off += len(raw)
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in bufs:
            f.write(raw)


# ---------------------------------------------------------------------------
# tolerant plain-pickle reader (for cdb.dat / vocab.dat in reference packs)


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler for reference ``cdb.dat``/``vocab.dat``: allows the data
    types those files actually contain (builtins, collections, numpy) and
    degrades anything else — e.g. a dill-pickled
    ``weighted_average_function`` (dill._dill._create_function) or a
    medcat class instance — to an inert stub instead of failing the load.
    """

    # NOTHING is allowlisted wholesale: builtins holds eval/exec, and
    # numpy holds runnable gadgets (numpy.testing...runstring,
    # numpy.f2py.compile, numpy.ctypeslib.load_library — PoC-confirmed).
    # Only the data (re)constructors these files actually need pass.
    _SAFE_BUILTINS = {"set", "frozenset", "list", "tuple", "dict", "str",
                      "bytes", "bytearray", "int", "float", "complex",
                      "bool", "slice", "range", "object"}
    _SAFE_COLLECTIONS = {"OrderedDict", "defaultdict", "Counter", "deque"}
    _SAFE_NUMPY = {"ndarray", "dtype", "_reconstruct", "scalar",
                   "_frombuffer"}

    def find_class(self, module: str, name: str):
        root = module.split(".")[0]
        if root == "numpy":
            if name in self._SAFE_NUMPY:
                return super().find_class(module, name)
            return _Inert
        if module == "builtins":
            if name in self._SAFE_BUILTINS:
                return super().find_class(module, name)
            return _Inert
        if module == "collections":
            if name in self._SAFE_COLLECTIONS:
                return super().find_class(module, name)
            return _Inert
        if module == "functools" and name == "partial":
            return super().find_class(module, name)
        if module == "copyreg" and name == "_reconstructor":
            return super().find_class(module, name)
        return _Inert

    def persistent_load(self, pid):
        return _Inert()


def tolerant_pickle_load(path: str):
    with open(path, "rb") as f:
        return _TolerantUnpickler(f).load()


def is_inert(obj) -> bool:
    return isinstance(obj, _Inert)
