""".pt codec byte-compatibility vs real torch.save/torch.load."""
import numpy as np
import pytest

from aphantasia_tpu.io.checkpoint import load_pt, save_pt

torch = pytest.importorskip("torch")


def test_load_torch_saved_tensor(tmp_path):
    p = str(tmp_path / "a.pt")
    t = torch.randn(2, 3, 8, 5, 2)
    torch.save(t, p)
    got = load_pt(p)
    np.testing.assert_array_equal(got, t.numpy())


def test_load_torch_saved_list(tmp_path):
    """clip_fft saves a params LIST (clip_fft.py:315)."""
    p = str(tmp_path / "b.pt")
    ts = [torch.randn(1, 3, 16, 9, 2), torch.randn(4)]
    torch.save(ts, p)
    got = load_pt(p)
    assert isinstance(got, list) and len(got) == 2
    np.testing.assert_array_equal(got[0], ts[0].numpy())
    np.testing.assert_array_equal(got[1], ts[1].numpy())


def test_load_torch_saved_dict_and_dtypes(tmp_path):
    p = str(tmp_path / "c.pt")
    obj = {"w": torch.arange(10, dtype=torch.int64),
           "x": torch.randn(3, 3).double(),
           "y": torch.tensor([True, False]),
           "z": torch.randn(2, 2).half(),
           "s": "hello", "n": 3, "f": 2.5}
    torch.save(obj, p)
    got = load_pt(p)
    np.testing.assert_array_equal(got["w"], obj["w"].numpy())
    np.testing.assert_array_equal(got["x"], obj["x"].numpy())
    np.testing.assert_array_equal(got["y"], obj["y"].numpy())
    np.testing.assert_array_equal(got["z"], obj["z"].numpy())
    assert got["s"] == "hello" and got["n"] == 3 and got["f"] == 2.5


def test_load_noncontiguous_view(tmp_path):
    p = str(tmp_path / "d.pt")
    t = torch.randn(6, 8).t()  # transposed stride
    torch.save(t, p)
    np.testing.assert_array_equal(load_pt(p), t.numpy())


def test_torch_reads_our_tensor(tmp_path):
    p = str(tmp_path / "e.pt")
    arr = np.random.RandomState(0).randn(1, 3, 8, 5, 2).astype(np.float32)
    save_pt(p, arr)
    got = torch.load(p)
    assert isinstance(got, torch.Tensor)
    np.testing.assert_array_equal(got.numpy(), arr)


def test_torch_reads_our_list(tmp_path):
    p = str(tmp_path / "f.pt")
    arrs = [np.random.rand(2, 3).astype(np.float32),
            np.arange(5, dtype=np.int64)]
    save_pt(p, arrs)
    got = torch.load(p)
    assert isinstance(got, list)
    np.testing.assert_array_equal(got[0].numpy(), arrs[0])
    np.testing.assert_array_equal(got[1].numpy(), arrs[1])


def test_torch_reads_our_dict(tmp_path):
    p = str(tmp_path / "g.pt")
    obj = {"params": np.ones((4, 4), np.float32), "step": 7, "name": "fft"}
    save_pt(p, obj)
    got = torch.load(p)
    np.testing.assert_array_equal(got["params"].numpy(), obj["params"])
    assert got["step"] == 7 and got["name"] == "fft"


def test_roundtrip_ours_only(tmp_path):
    p = str(tmp_path / "h.pt")
    obj = [np.random.rand(3, 7).astype(np.float32)]
    save_pt(p, obj)
    got = load_pt(p)
    np.testing.assert_array_equal(got[0], obj[0])


def test_jax_array_input(tmp_path):
    import jax.numpy as jnp
    p = str(tmp_path / "i.pt")
    save_pt(p, jnp.ones((2, 2)))
    np.testing.assert_array_equal(load_pt(p), np.ones((2, 2), np.float32))
