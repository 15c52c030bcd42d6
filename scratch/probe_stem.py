"""Where do the stem's 9.7 ms go? Times conv-only variants of the flagship
stem geometry (B=512, 32x128, bf16) to separate conv cost from BN/relu
elementwise cost and channel-packing inefficiency."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import enable_compile_cache, timed_scan  # noqa: E402


def main():
    enable_compile_cache()
    import jax, jax.numpy as jnp, numpy as np
    from functools import partial
    rng = np.random.default_rng(0)
    B = 512
    x0 = jnp.asarray(rng.standard_normal((B, 32, 128, 3)), jnp.bfloat16)

    def conv(x, cout, stride=1, k=3):
        w = jnp.asarray(rng.standard_normal(
            (k, k, x.shape[-1], cout)) * 0.05, jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # flagship stem conv stack geometry: stem 3->32 s1; layer1 = 3 blocks
    # (1x1 + 3x3) @32 s1; layer2 = 4 blocks @64 s2-first
    def convs_only(x, ch1=32, ch2=64):
        x = conv(x, ch1)
        for b in range(3):
            y = conv(x, ch1, k=1)
            y = conv(y, ch1)
            x = x + y
        for b in range(4):
            s = 2 if b == 0 else 1
            y = conv(x, ch2, k=1, stride=s)
            y = conv(y, ch2)
            x = (conv(x, ch2, k=1, stride=s) if b == 0 else x) + y
        return x

    def convs_bn_relu(x, ch1=32, ch2=64):
        def bnr(t):
            g = jnp.ones((t.shape[-1],), jnp.bfloat16)
            return jax.nn.relu(t * g + 0.1)
        x = bnr(conv(x, ch1))
        for b in range(3):
            y = bnr(conv(x, ch1, k=1))
            y = bnr(conv(y, ch1))
            x = x + y
        for b in range(4):
            s = 2 if b == 0 else 1
            y = bnr(conv(x, ch2, k=1, stride=s))
            y = bnr(conv(y, ch2))
            x = (conv(x, ch2, k=1, stride=s) if b == 0 else x) + y
        return x

    for name, fn in (
            ('convs only 32/64ch', partial(convs_only)),
            ('convs+bn+relu 32/64', partial(convs_bn_relu)),
            ('convs only 128/128ch', partial(convs_only, ch1=128, ch2=128)),
    ):
        sec = timed_scan(lambda x, _f=fn: _f(x), (x0,))
        print(f'{name:24s} {sec*1e3:7.2f} ms', flush=True)

if __name__ == '__main__':
    main()
