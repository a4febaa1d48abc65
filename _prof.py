import jax, jax.numpy as jnp, time
from realise_tpu.config import config_for
from realise_tpu.data.dataset import synthetic_dataset
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import init_realise
from realise_tpu.text.glyphs import build_glyph_table
from realise_tpu.text.tokenizer import WordPieceTokenizer
from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict
from realise_tpu.training.trainer import Trainer

B = 256
vocab = build_synthetic_vocab(size=21128)
tok = WordPieceTokenizer(vocab_to_dict(vocab))
cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tok), dtype="bfloat16").replace(remat=True)
glyphs = build_glyph_table(vocab, num_fonts=cfg.num_fonts, use_traditional_font=cfg.use_traditional_font, font_size=cfg.glyph_size)
with jax.default_device(jax.devices("cpu")[0]):
    params, state = init_realise(jax.random.PRNGKey(0), cfg, glyphs=glyphs)
dev = jax.devices()[0]
params = jax.device_put(params, dev); state = jax.device_put(state, dev)
feat = Featurizer(tok, cfg)
data = synthetic_dataset(tok, num_examples=B, min_len=20, max_len=100, seed=0)
batch = {k: jnp.asarray(v) for k, v in feat.device_batch(feat.featurize(data)).items()}
tr = Trainer(cfg, params, state, learning_rate=5e-5, total_steps=1000, seed=0, use_pallas=True)
step_arr = jnp.asarray(0, jnp.int32)
def one():
    t = tr.train_state
    p2, s2, o2, loss = tr._train_step(t.params, t.state, t.opt_state, batch, step_arr)
    tr.train_state = type(t)(p2, s2, o2, t.step + 1)
    return loss
for _ in range(2):
    jax.device_get(one().ravel()[:1])
with jax.profiler.trace("/tmp/traindir"):
    for _ in range(3):
        loss = one()
    jax.device_get(loss.ravel()[:1])
print("trace done")
