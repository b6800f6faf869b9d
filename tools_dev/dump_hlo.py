import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
    H, W, B = 192, 640, 16
    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x1 = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))
    x = jax.random.uniform(rng, (B, H, W, 3), jnp.float32)
    def fwd(ev, dv, img):
        return decoder.apply(dv, encoder.apply(ev, img))[("disp", 0)]
    txt = jax.jit(fwd).lower(enc_vars, dec_vars, x).compile().as_text()
    open("/tmp/fwd_hlo.txt", "w").write(txt)
    print("wrote", len(txt), "bytes")

main()
