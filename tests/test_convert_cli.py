"""utils/convert CLI: torch .pth -> msgpack component round trip.

The bridge functions themselves are numerically tested elsewhere
(test_bridge_numeric, test_token_parity); this covers the CLI layer —
torch file reading, converter dispatch, msgpack writing — and that the
written component loads back tree- and value-identical."""

import os
import sys

import numpy as np
import pytest

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")

from tests.test_token_parity import TorchSoftDecoder  # noqa: E402


def test_convert_decoder_roundtrip(tmp_path, capsys):
    import jax
    from depth_image_captioning_pub_tpu.utils import convert
    from depth_image_captioning_pub_tpu.utils.checkpoint import load_component
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)

    tdec = TorchSoftDecoder()
    src = tmp_path / "decoder.pth"
    torch.save(tdec.state_dict(), src)
    out = tmp_path / "decoder_out"

    convert.main(["--kind", "decoder", "--src", str(src),
                  "--out", str(out)])
    assert "wrote" in capsys.readouterr().out
    assert (tmp_path / "decoder_out.msgpack").exists()

    expect = attention_decoder_to_flax(
        {k: v.detach().numpy() for k, v in tdec.state_dict().items()})
    got = load_component(str(out), jax.tree.map(np.asarray, expect))
    flat_e = jax.tree_util.tree_leaves_with_path(expect)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    assert [p for p, _ in flat_e] == [p for p, _ in flat_g]
    for (_, a), (_, b) in zip(flat_e, flat_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_rejects_unknown_kind(tmp_path):
    from depth_image_captioning_pub_tpu.utils import convert
    with pytest.raises(SystemExit):
        convert.main(["--kind", "warp", "--src", "x", "--out", "y"])
