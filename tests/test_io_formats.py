"""IO codecs: safetensors + torch zip-pickle, round-tripped against the
real libraries as oracles (torch/safetensors used only as test oracles)."""

import numpy as np
import pytest
import torch

from imagharmony_tpu.io import safetensors_io, torch_pickle


def _tree():
    rng = np.random.default_rng(0)
    return {
        "image_proj": {
            "proj.weight": rng.normal(size=(8, 4)).astype(np.float32),
            "proj.bias": rng.normal(size=(8,)).astype(np.float32),
        },
        "ip_adapter": {
            "1.to_k_ip.weight": rng.normal(size=(6, 6)).astype(np.float16),
        },
        "composed_adapter": {
            "fc1.weight": rng.normal(size=(4, 8)).astype(np.float32),
            "meta_step": 7,
        },
    }


def test_torch_bin_reader_reads_torch_save(tmp_path):
    tree = _tree()
    tt = {
        k: {k2: torch.tensor(v2) if isinstance(v2, np.ndarray) else v2 for k2, v2 in v.items()}
        for k, v in tree.items()
    }
    p = tmp_path / "ckpt.bin"
    torch.save(tt, p)
    loaded = torch_pickle.load(p)
    for k, sub in tree.items():
        for k2, v2 in sub.items():
            if isinstance(v2, np.ndarray):
                np.testing.assert_array_equal(loaded[k][k2], v2)
            else:
                assert loaded[k][k2] == v2


def test_torch_bin_writer_loads_with_torch(tmp_path):
    tree = _tree()
    p = tmp_path / "ours.bin"
    torch_pickle.save(p, tree)
    loaded = torch.load(p, map_location="cpu", weights_only=False)
    for k, sub in tree.items():
        for k2, v2 in sub.items():
            got = loaded[k][k2]
            if isinstance(v2, np.ndarray):
                np.testing.assert_array_equal(got.numpy(), v2)
            else:
                assert got == v2


def test_torch_bin_roundtrip_no_torch(tmp_path):
    tree = _tree()
    p = tmp_path / "rt.bin"
    torch_pickle.save(p, tree)
    loaded = torch_pickle.load(p)
    np.testing.assert_array_equal(
        loaded["image_proj"]["proj.weight"], tree["image_proj"]["proj.weight"]
    )


def test_torch_bin_bfloat16(tmp_path):
    import ml_dtypes

    arr = np.arange(8, dtype=np.float32).astype(ml_dtypes.bfloat16)
    p = tmp_path / "bf16.bin"
    torch_pickle.save(p, {"w": arr})
    # torch oracle
    loaded = torch.load(p, map_location="cpu", weights_only=False)
    assert loaded["w"].dtype == torch.bfloat16
    np.testing.assert_array_equal(loaded["w"].float().numpy(), arr.astype(np.float32))
    # our reader
    ours = torch_pickle.load(p)
    assert ours["w"].dtype.name == "bfloat16"


def test_safetensors_roundtrip_and_oracle(tmp_path):
    import safetensors.numpy as st

    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.c": np.ones((2, 2), np.float16),
    }
    p1 = tmp_path / "ours.safetensors"
    safetensors_io.save(p1, tensors, metadata={"k": "v"})
    # their reader reads ours
    theirs = st.load_file(str(p1))
    np.testing.assert_array_equal(theirs["a"], tensors["a"])
    np.testing.assert_array_equal(theirs["b.c"], tensors["b.c"])
    # our reader reads theirs
    p2 = tmp_path / "theirs.safetensors"
    st.save_file(tensors, str(p2))
    ours, meta = safetensors_io.load(p2)
    np.testing.assert_array_equal(ours["a"], tensors["a"])
    # metadata round trip
    ours1, meta1 = safetensors_io.load(p1)
    assert meta1 == {"k": "v"}


def test_blocked_globals_raise(tmp_path):
    import pickle

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    p = tmp_path / "evil.bin"
    import zipfile

    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(Exception):
        torch_pickle.load(p)


def test_oob_tensor_views_rejected():
    """Crafted offset/size/stride combos must not read outside the storage
    (the safe-unpickler posture extends to the view-materialization step)."""

    class Ref:
        dtype = "float32"
        key = "0"

    storage = np.arange(8, dtype=np.float32).tobytes()
    read = lambda key: storage

    # in-bounds view works
    ok = torch_pickle._materialize(("tensor", Ref(), 0, (2, 2), (2, 1)), read)
    np.testing.assert_array_equal(ok, [[0, 1], [2, 3]])

    for offset, size, stride in [
        (0, (3, 3), (3, 1)),      # last element index 8 >= numel 8
        (6, (2, 2), (2, 1)),      # offset pushes view past the end
        (-1, (2, 2), (2, 1)),     # negative offset
        (0, (2, 2), (-2, 1)),     # negative stride
        (100, (), ()),            # scalar offset out of range
    ]:
        with pytest.raises(ValueError):
            torch_pickle._materialize(("tensor", Ref(), offset, size, stride), read)
