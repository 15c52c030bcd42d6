#!/usr/bin/env python
"""NER demo (reference ``demo/ner_demo.py``): classify entities in a
sentence with the BERT-softmax model.

    python demo/ner_demo.py [CONFIG] [CHECKPOINT] --text "..."
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tps_pp_tpu.utils.platform import apply_jax_platform_env
    apply_jax_platform_env()   # honor JAX_PLATFORMS despite the axon plugin
    p = argparse.ArgumentParser(description='NER demo')
    p.add_argument('config', nargs='?',
                   default='configs/ner/bert_softmax/'
                           'bert_softmax_cluener_18e.py')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--text', default='xiaoming went to beijing')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tps_pp_tpu.config import load_config
    from tps_pp_tpu.apis.train_kie import _build
    from tps_pp_tpu.models.ner.bert import NerClassifierModule
    from tps_pp_tpu.registry import ENCODERS, HEADS

    cfg = load_config(args.config)
    categories = cfg['categories']
    tag2id = {'O': 0}
    for c in categories:
        tag2id[f'B-{c}'] = len(tag2id)
        tag2id[f'I-{c}'] = len(tag2id)
    id2tag = {v: k for k, v in tag2id.items()}

    module = NerClassifierModule(
        encoder=_build(ENCODERS, cfg['model']['encoder']),
        decoder=_build(HEADS, cfg['model']['decoder']))
    max_len = int(cfg.get('max_len', 128))
    ids = np.zeros((1, max_len), np.int32)
    mask = np.zeros((1, max_len), np.int32)
    for i, ch in enumerate(args.text[:max_len]):
        ids[0, i] = (ord(ch) % 20000) + 100
        mask[0, i] = 1
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, max_len), jnp.int32))
    if args.checkpoint:
        from tps_pp_tpu.utils.checkpoint import load_variables
        variables = load_variables(args.checkpoint, variables)
    logits = module.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    tags = np.asarray(logits).argmax(-1)[0]
    n = int(mask.sum())
    print(args.text)
    print(' '.join(id2tag[int(t)] for t in tags[:n]))


if __name__ == '__main__':
    main()
