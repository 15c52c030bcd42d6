"""KIE (SDMGR) + NER (BERT) smoke tests (reference analog:
tests/test_models/test_kie_config.py, test_ner_model.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from tps_pp_tpu.models.kie import SDMGRHead, SDMGRLoss
from tps_pp_tpu.models.ner import (BertEncoder, FCDecoder,
                                   NerClassifierModule,
                                   MaskedCrossEntropyLoss)


def test_sdmgr_head_and_loss():
    rng = np.random.default_rng(0)
    N, L, E = 6, 12, 5
    texts = jnp.asarray(rng.integers(1, 92, (N, L)), jnp.int32)
    texts = texts.at[4:, 6:].set(0)  # padded chars
    relations = jnp.asarray(rng.standard_normal((N, N, E)), jnp.float32)
    head = SDMGRHead(num_chars=92, num_classes=26, node_embed=32,
                     edge_embed=32, fusion_dim=64, visual_dim=8)
    visual = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    v = head.init(jax.random.PRNGKey(0), relations, texts, visual)
    node_cls, edge_cls = head.apply(v, relations, texts, visual)
    assert node_cls.shape == (N, 26)
    assert edge_cls.shape == (N * N, 2)

    node_gts = jnp.asarray(rng.integers(0, 26, (N,)), jnp.int32)
    edge_gts = jnp.asarray(rng.integers(0, 2, (N, N)), jnp.int32)
    losses = SDMGRLoss()(node_cls, edge_cls, node_gts, edge_gts)
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_ner_bert():
    rng = np.random.default_rng(1)
    model = NerClassifierModule(
        encoder=BertEncoder(vocab_size=100, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64,
                            max_position_embeddings=64),
        decoder=FCDecoder(num_labels=7))
    ids = jnp.asarray(rng.integers(0, 100, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32).at[1, 10:].set(0)
    v = model.init(jax.random.PRNGKey(0), ids, mask)
    logits = model.apply(v, ids, mask)
    assert logits.shape == (2, 16, 7)
    labels = jnp.asarray(rng.integers(0, 7, (2, 16)), jnp.int32)
    loss = MaskedCrossEntropyLoss()(logits, labels, mask)
    assert np.isfinite(float(loss['loss_cls']))
