"""Torch checkpoint import: numerical parity against HF transformers BERT.

The installed transformers (4.x) BertModel computes the same math as the
reference's vendored 2.2.2 BERT (post-LN, −10000 mask, erf-gelu), so it
serves as the ground-truth oracle for the key mapping + forward parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from realise_tpu.config import RealiseConfig
from realise_tpu.models.torch_import import (
    import_char_resnet,
    import_hf_bert,
)
from realise_tpu.ops.bert import bert_model


TINY_HF = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=64,
               max_position_embeddings=32, type_vocab_size=2,
               hidden_act="gelu", hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)


@pytest.fixture(scope="module")
def hf_pair():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(**TINY_HF)
    model = transformers.BertModel(hf_cfg)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = RealiseConfig(**{k: v for k, v in TINY_HF.items()
                           if k in RealiseConfig.__dataclass_fields__})
    return model, sd, cfg


def test_hf_bert_forward_parity(hf_pair):
    model, sd, cfg = hf_pair
    params = import_hf_bert(sd, cfg, prefix="")

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()

    got = bert_model(jax.tree.map(jnp.asarray, params), cfg,
                     input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_hf_bert_inputs_embeds_parity(hf_pair):
    """ReaLiSe feeds fused states via inputs_embeds with zeroed positions
    (src/models.py:852-854) — the import must agree on that path too."""
    model, sd, cfg = hf_pair
    params = import_hf_bert(sd, cfg, prefix="")

    rng = np.random.RandomState(1)
    embeds = rng.randn(2, 8, cfg.hidden_size).astype(np.float32)
    mask = np.ones((2, 8), np.int64)
    pos0 = np.zeros((2, 8), np.int64)

    with torch.no_grad():
        want = model(inputs_embeds=torch.tensor(embeds),
                     attention_mask=torch.tensor(mask),
                     position_ids=torch.tensor(pos0)
                     ).last_hidden_state.numpy()

    got = bert_model(jax.tree.map(jnp.asarray, params), cfg,
                     inputs_embeds=jnp.asarray(embeds),
                     attention_mask=jnp.asarray(mask),
                     position_ids=jnp.asarray(pos0))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_char_resnet_import_parity():
    """Import a torch CharResNet-style block stack and compare outputs.

    Builds the torch module inline with the same wiring as the reference
    (conv-BN-relu-conv-BN + 1×1 shortcut, src/char_cnn.py:9-55)."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=2):
            super().__init__()
            self.residual_function = nn.Sequential(
                nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
                nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout),
            )
            self.shortcut = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

        def forward(self, x):
            return nn.functional.relu(self.residual_function(x) + self.shortcut(x))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.res_block1 = Block(2, 4)
            self.res_block2 = Block(4, 8)

        def forward(self, x):
            return self.res_block2(self.res_block1(x))

    torch.manual_seed(0)
    net = Net()
    net.eval()
    # Give BN stats non-trivial values.
    with torch.no_grad():
        net(torch.randn(4, 2, 32, 32))
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, state = import_char_resnet(sd, "", num_blocks=2)

    from realise_tpu.ops.resnet import basic_block

    x = np.random.RandomState(0).randn(3, 2, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = net(torch.tensor(x)).numpy()

    h = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NCHW → NHWC
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    h, _ = basic_block(params["block1"], state["block1"], h, stride=2,
                       train=False)
    h, _ = basic_block(params["block2"], state["block2"], h, stride=2,
                       train=False)
    got = np.transpose(np.asarray(h), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_torch_gru_import_parity():
    """torch nn.GRU last-hidden vs our masked scan after key mapping."""
    from realise_tpu.models.torch_import import _import_gru
    from realise_tpu.ops.gru import gru_last_hidden

    torch.manual_seed(0)
    gru = torch.nn.GRU(input_size=6, hidden_size=10, num_layers=1,
                       batch_first=True)
    sd = {f"g.{k}": v.detach().numpy() for k, v in gru.state_dict().items()}
    params = _import_gru(sd, "g")

    rng = np.random.RandomState(0)
    x = rng.randn(5, 7, 6).astype(np.float32)
    lens = np.array([7, 3, 1, 5, 2])

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lens), batch_first=True,
        enforce_sorted=False)
    with torch.no_grad():
        _, h_n = gru(packed)
    want = h_n.squeeze(0).numpy()

    got = np.asarray(gru_last_hidden(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(lens)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_char_resnet1_import_parity():
    """CharResNet1 (--image_model_type 1) end-to-end incl. the final
    flatten: torch's h.view flattens NCHW channel-major (src/char_cnn.py:73)
    and the import must not permute the output features (round-2 fix —
    previously the NHWC flatten fed downstream weights a permuted vector)."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=2):
            super().__init__()
            self.residual_function = nn.Sequential(
                nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
                nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout),
            )
            self.shortcut = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

        def forward(self, x):
            return nn.functional.relu(self.residual_function(x) + self.shortcut(x))

    # hidden=48 → channel plan [4, 8, 12, 12]; 32→2 spatial; 2·2·12 = 48.
    chans = [4, 8, 12, 12]

    class Net1(nn.Module):
        def __init__(self):
            super().__init__()
            prev = 1
            for i, c in enumerate(chans, start=1):
                setattr(self, f"res_block{i}", Block(prev, c))
                prev = c

        def forward(self, x):
            for i in range(1, 5):
                x = getattr(self, f"res_block{i}")(x)
            return x.reshape(x.shape[0], -1)  # torch NCHW flatten

    torch.manual_seed(1)
    net = Net1()
    with torch.no_grad():
        net(torch.randn(4, 1, 32, 32))
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, state = import_char_resnet(sd, "", num_blocks=4)

    from realise_tpu.ops.resnet import char_resnet

    x = np.random.RandomState(1).randn(3, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = net(torch.tensor(x)).numpy()          # (3, 48)

    h = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))   # NCHW → NHWC
    got, _ = char_resnet(jax.tree.map(jnp.asarray, params),
                         jax.tree.map(jnp.asarray, state), h,
                         train=False, variant="resnet1", hidden_size=48)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_tokenizer_fuzz_parity_vs_hf(tokenizer, tmp_path):
    """Fuzz our WordPieceTokenizer against HF's BertTokenizer over the same
    vocab: metric parity depends on byte-identical tokenization (##-pieces,
    [UNK] mapping, per-CJK-char splitting — reference vendored
    tokenization_bert.py)."""
    import random

    from transformers import BertTokenizer

    vocab_path = tokenizer.save_pretrained(str(tmp_path))
    hf = BertTokenizer(vocab_path, do_lower_case=True)

    cjk = [t for t in tokenizer.vocab if len(t) == 1 and 0x4E00 <= ord(t) <= 0x9FFF]
    ascii_words = ["hello", "world", "ok", "GPU", "a1b2"]
    punct = list("，。？！,.?! 　")
    rng = random.Random(42)
    for _ in range(200):
        parts = []
        for _ in range(rng.randint(1, 12)):
            r = rng.random()
            if r < 0.6:
                parts.append(rng.choice(cjk))
            elif r < 0.8:
                parts.append(rng.choice(ascii_words))
            else:
                parts.append(rng.choice(punct))
        text = "".join(parts)
        assert tokenizer.tokenize(text) == hf.tokenize(text), repr(text)
