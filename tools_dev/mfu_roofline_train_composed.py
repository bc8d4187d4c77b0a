"""Analytic per-layer rooflines: train step + composed workload (MFU.md).

Extends ``mfu_roofline.py`` (extraction forward) to the two workloads
VERDICT r4 flagged as bar-less:

* **train step** — ResNet101-GeM contrastive step at the bench's tuple
  geometry (35 images of 362x362 padded to the 384x384 bucket): forward +
  input-gradient + weight-gradient conv passes, BN train-mode stat traffic,
  f32 master weight-grad writes, the padding waste of the bucket, and the
  optimizer update's HBM passes.
* **composed** — p2p U-Net translation at pad-256 768x1024 -> VGG16-GeM
  3-scale embedding (the eval_composition.yml workload), batch 4.

Same model as mfu_roofline.py: per conv, time = max(flops / eff_peak,
bytes / HBM); eff derates the 128x128 MXU when the reduction dim K=cin*k^2
or the output-channel dim is under 128. Perfect fusion assumed — the
ceiling is compiler-independent and optimistic.

v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
"""
import math

PEAK = 197e12
HBM = 819e9
BF16 = 2
F32 = 4


def conv_time(batch, cin, cout, k, s, ho, wo, act_bytes=BF16,
              weight_bytes=BF16, transpose=False):
    """(flops, seconds) for one conv under the tiled-MXU roofline."""
    if transpose:
        # stride-s convT: each input pixel contributes to k*k outputs
        flops = 2 * batch * (ho // s) * (wo // s) * cout * cin * k * k
        hi, wi = ho // s, wo // s
    else:
        flops = 2 * batch * ho * wo * cout * cin * k * k
        hi, wi = ho * s, wo * s
    K = cin * k * k
    eff = (min(K, 128) / 128) * (min(cout, 128) / 128)
    t_mxu = flops / (PEAK * eff)
    bytes_ = act_bytes * batch * (cin * hi * wi + cout * ho * wo) \
        + weight_bytes * K * cout
    t_hbm = bytes_ / HBM
    return flops, max(t_mxu, t_hbm), t_mxu, t_hbm


def resnet101_convs(h, w):
    convs = [("stem", 3, 64, 7, 2, h // 2, w // 2)]
    h, w = h // 4, w // 4
    blocks = [(3, 256, 64), (4, 512, 128), (23, 1024, 256), (3, 2048, 512)]
    cin = 64
    for bi, (n, cout, mid) in enumerate(blocks):
        for i in range(n):
            stride = 2 if (i == 0 and bi > 0) else 1
            ho, wo = h // stride, w // stride
            convs.append((f"b{bi}.{i}.c1", cin, mid, 1, 1, h, w))
            convs.append((f"b{bi}.{i}.c2", mid, mid, 3, stride, ho, wo))
            convs.append((f"b{bi}.{i}.c3", mid, cout, 1, 1, ho, wo))
            if i == 0:
                convs.append((f"b{bi}.{i}.dn", cin, cout, 1, stride, ho, wo))
            cin = cout
            h, w = ho, wo
    return convs


def vgg16_convs(h, w):
    convs = []
    cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
    cin = 3
    for bi, (n, cout) in enumerate(cfg):
        for i in range(n):
            convs.append((f"v{bi}.{i}", cin, cout, 3, 1, h, w))
            cin = cout
        if bi < len(cfg) - 1:
            h, w = h // 2, w // 2  # maxpool between stages
    return convs


def p2p_unet_convs(h, w, cin0=3, cout0=3, levels=7):
    """Encoder 4x4 s2 chain + decoder convT chain with skip-concat widths."""
    blocks = ([(64, 128), (128, 256), (256, 512), (512, 512)][:levels]
              + [(512, 512)] * max(0, levels - 4))
    convs = [("enc0", cin0, 64, 4, 2, h // 2, w // 2)]
    res = (h // 2, w // 2)
    encs = []
    for i, (ci, co) in enumerate(blocks):
        nxt = (res[0] // 2, res[1] // 2)
        convs.append((f"enc{i + 1}", ci, co, 4, 2, nxt[0], nxt[1]))
        encs.append((ci, co, res, nxt))
        res = nxt
    for i, (ci, co, r, _r2) in enumerate(reversed(encs)):
        cin_t = co if i == 0 else 2 * co  # skip concat above the innermost
        convs.append((f"dec{levels - i}", cin_t, ci, 4, 2, r[0], r[1],
                      "T"))
    convs.append(("dec0", 2 * 64, cout0, 4, 2, h, w, "T"))
    return convs


def sum_convs(convs, batch, act_bytes=BF16, weight_bytes=BF16):
    tot_f = tot_t = tot_mxu = tot_hbm = 0.0
    for c in convs:
        name, cin, cout, k, s, ho, wo = c[:7]
        transpose = len(c) > 7 and c[7] == "T"
        f, t, tm, th = conv_time(batch, cin, cout, k, s, ho, wo,
                                 act_bytes, weight_bytes, transpose)
        tot_f += f
        tot_t += t
        tot_mxu += tm
        tot_hbm += th
    return tot_f, tot_t, tot_mxu, tot_hbm


def train_step(batch=35, shape=(384, 384), useful_shape=(362, 362),
               n_params=42.6e6, remat_frac=0.0):
    """ResNet101 contrastive train step roofline.

    Forward + dgrad + wgrad conv passes (3x forward flops); wgrad writes
    f32 master grads (weight_bytes=F32 on its output, approximated by
    running the wgrad pass with f32 weight traffic); BN train-mode stats
    cost ~3 extra activation passes over every BN output; the optimizer
    update reads/writes params+grads+momentum in f32. ``remat_frac`` adds
    that fraction of the forward again (size-gated rematerialization).
    """
    convs = resnet101_convs(*shape)

    fwd_f, fwd_t, fwd_mxu, fwd_hbm = sum_convs(convs, batch)
    # dgrad: same contraction sizes (weights transposed), bf16
    dg_f, dg_t, _, _ = sum_convs(convs, batch)
    # wgrad: reduction over batch*pixels (always fills the MXU), f32 output
    wg_f, wg_t, _, _ = sum_convs(convs, batch, weight_bytes=F32)

    # BN train stats: mean/var reduction + normalize-apply + bwd stat
    # passes ~ 3 reads + 1 write of each conv output (bf16)
    bn_bytes = sum(4 * BF16 * batch * c[2] * c[5] * c[6] for c in convs)
    bn_t = bn_bytes / HBM

    # optimizer (sgd+momentum, f32): read p, g, m; write p, m
    opt_t = 5 * F32 * n_params / HBM

    remat_t = remat_frac * fwd_t
    remat_f = remat_frac * fwd_f

    flops = fwd_f + dg_f + wg_f + remat_f
    t = fwd_t + dg_t + wg_t + bn_t + opt_t + remat_t
    useful = (useful_shape[0] * useful_shape[1]) / (shape[0] * shape[1])
    return {
        "flops_tf": flops / 1e12,
        "time_ms": t * 1e3,
        "fwd_ms": fwd_t * 1e3, "dgrad_ms": dg_t * 1e3,
        "wgrad_ms": wg_t * 1e3, "bn_ms": bn_t * 1e3,
        "opt_ms": opt_t * 1e3, "remat_ms": remat_t * 1e3,
        "ceiling_mfu": flops / t / PEAK,
        "ceiling_tuples_per_s": (batch / 7) / t,
        "padding_waste": 1 - useful,
        "ceiling_mfu_useful": flops * useful / t / PEAK,
    }


def composed(batch=4, hw=(768, 1024), scales=(1, 1 / math.sqrt(2), 0.5)):
    """U-Net translation (full res, once) + VGG16 embedding (3 scales)."""
    un_f, un_t, un_mxu, un_hbm = sum_convs(p2p_unet_convs(*hw), batch)
    vg_f = vg_t = vg_mxu = vg_hbm = 0.0
    for s in scales:
        sh = (int(hw[0] * s), int(hw[1] * s))
        f, t, tm, th = sum_convs(vgg16_convs(*sh), batch)
        vg_f += f
        vg_t += t
        vg_mxu += tm
        vg_hbm += th
    flops, t = un_f + vg_f, un_t + vg_t
    return {
        "unet_flops_tf": un_f / 1e12, "unet_ms": un_t * 1e3,
        "unet_mxu_ms": un_mxu * 1e3, "unet_hbm_ms": un_hbm * 1e3,
        "vgg_flops_tf": vg_f / 1e12, "vgg_ms": vg_t * 1e3,
        "vgg_mxu_ms": vg_mxu * 1e3, "vgg_hbm_ms": vg_hbm * 1e3,
        "total_flops_tf": flops / 1e12, "total_ms": t * 1e3,
        "ceiling_imgs_per_s": batch / t,
        "ceiling_mfu": flops / t / PEAK,
    }


def main():
    print("== train step (batch 35 @ 384x384 bucket, ResNet101) ==")
    for remat in (0.0, 1.0):
        r = train_step(remat_frac=remat)
        print(f" remat={remat:.0%}: ceiling {r['ceiling_tuples_per_s']:.1f} "
              f"tuples/s, MFU {r['ceiling_mfu']:.3f} "
              f"(useful-pixel {r['ceiling_mfu_useful']:.3f}); "
              f"fwd {r['fwd_ms']:.0f} dgrad {r['dgrad_ms']:.0f} "
              f"wgrad {r['wgrad_ms']:.0f} bn {r['bn_ms']:.0f} "
              f"opt {r['opt_ms']:.1f} remat {r['remat_ms']:.0f} ms; "
              f"padding waste {r['padding_waste']:.1%}")

    print("== composed (batch 4 @ 768x1024 pad-256, U-Net + VGG16 x3) ==")
    c = composed()
    print(f" U-Net {c['unet_flops_tf']:.2f} TF in {c['unet_ms']:.0f} ms "
          f"(MXU {c['unet_mxu_ms']:.0f} / HBM {c['unet_hbm_ms']:.0f})")
    print(f" VGG16 {c['vgg_flops_tf']:.2f} TF in {c['vgg_ms']:.0f} ms "
          f"(MXU {c['vgg_mxu_ms']:.0f} / HBM {c['vgg_hbm_ms']:.0f})")
    print(f" ceiling {c['ceiling_imgs_per_s']:.1f} img/s, "
          f"MFU {c['ceiling_mfu']:.3f}")


if __name__ == "__main__":
    main()
