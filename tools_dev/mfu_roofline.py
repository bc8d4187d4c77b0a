"""Analytic per-layer rooflines for the bench workloads (docs/MFU.md).

Three analyses (``python tools_dev/mfu_roofline.py [extract|train|composed]``,
default all):

* ``extract`` — ResNet101-GeM fused multiscale extraction (batch 8, scales
  1 / 0.707 / 0.5 of 768x1024; the bench's exact geometry).
* ``train``   — the contrastive train step at the reference's production
  tuple geometry (5 tuples x 7 images @ 362 max-side = batch 35, padded by
  prepare_batch to the 384^2 32-bucket; cirtorch train.py defaults):
  forward + backward-data + backward-weight per conv, plus the f32
  SGD/momentum update traffic. Remat does NOT fire at this geometry
  (35*384*384*3 = 15.5M < the 2^24 gate in learning/train_step.py), so no
  recompute term.
* ``composed`` — the eval_composition.yml workload (reference
  eval_composition.yml:1-11): p2p U-Net translation + VGG16-GeM embedding,
  all 3 scales of 768x1024 padded to 256-divisible, batch 4 (the bench's
  BENCH_COMPOSED_BATCH default). conv_transpose is modeled twice: useful
  FLOPs (each output pixel sees k^2/s^2 real taps) and XLA-executed FLOPs
  (zero-insertion lowering multiplies every k^2 tap — 4x waste at k=4,s=2),
  because the bench's ``composed_roofline_frac`` denominates in executed
  FLOPs (bench.py::_roofline_fields).

Method: for every conv, time = max(flops / eff_peak, bytes / 819 GB/s);
sum — an optimistic compiler-independent ceiling (perfect fusion of
BN/ReLU/residual into the conv, zero overhead between kernels).

Effective peak accounts for MXU tiling: a contraction with K reduction
elements and C output channels only fills the 128x128 systolic array to
(min(K,128)/128) x (min(C,128)/128) when K or C < 128 (channel-dim padding;
spatial dims are large everywhere here so the batch/pixel dim always fills).

v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
"""
import math
import sys

PEAK = 197e12
HBM = 819e9
BYTES = 2  # bf16


def resnet101_convs(h, w):
    """(name, cin, cout, k, stride, h_out, w_out) for every conv."""
    convs = [("stem", 3, 64, 7, 2, h // 2, w // 2)]
    h, w = h // 4, w // 4  # stem stride 2 + maxpool stride 2
    blocks = [(3, 256, 64), (4, 512, 128), (23, 1024, 256), (3, 2048, 512)]
    cin = 64
    for bi, (n, cout, mid) in enumerate(blocks):
        for i in range(n):
            stride = 2 if (i == 0 and bi > 0) else 1
            ho, wo = h // stride, w // stride
            convs.append((f"b{bi}.{i}.conv1", cin, mid, 1, 1, h, w))
            convs.append((f"b{bi}.{i}.conv2", mid, mid, 3, stride, ho, wo))
            convs.append((f"b{bi}.{i}.conv3", mid, cout, 1, 1, ho, wo))
            if i == 0:
                convs.append((f"b{bi}.{i}.down", cin, cout, 1, stride,
                              ho, wo))
            cin = cout
            h, w = ho, wo
    return convs


def vgg16_convs(h, w):
    """VGG16 features (models/trunks.py::VGG_CFGS['vgg16'], pre-pool cut)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    convs, cin, i = [], 3, 0
    for item in cfg:
        if item == "M":
            h, w = h // 2, w // 2
            continue
        convs.append((f"vgg.conv{i}", cin, item, 3, 1, h, w))
        cin = item
        i += 1
    return convs


def p2p_unet_convs(h, w, nested_levels=7, in_ch=3, out_ch=3):
    """(name, cin, cout, k, s, h_out, w_out, is_transpose) for the pix2pix
    U-Net (models/unet.py::P2pUNet): outer 4x4-s2 down + ``nested_levels``
    skip blocks, each convT input = 2*inter (SkipCat concat) except the
    innermost."""
    blocks = [(64, 128), (128, 256), (256, 512), (512, 512)][:nested_levels]
    blocks += [(512, 512)] * (nested_levels - len(blocks))
    convs = [("outer.down", in_ch, 64, 4, 2, h // 2, w // 2, False)]
    hh, ww = h // 2, w // 2
    dims = []  # (level, cin_l, cout_l, h_in, w_in) going down
    cin = 64
    for li, (cin_l, cout_l) in enumerate(blocks):
        dims.append((li, cin_l, cout_l, hh, ww))
        convs.append((f"l{li}.down", cin_l, cout_l, 4, 2,
                      hh // 2, ww // 2, False))
        hh, ww = hh // 2, ww // 2
    for li, cin_l, cout_l, h_in, w_in in reversed(dims):
        # convT at level li: input 2*cout_l (concat) except innermost
        tin = cout_l if li == nested_levels - 1 else 2 * cout_l
        convs.append((f"l{li}.up", tin, cin_l, 4, 2, h_in, w_in, True))
    convs.append(("outer.up", 128, out_ch, 4, 2, h, w, True))
    return convs


def _conv_cost(batch, cin, cout, k, s, ho, wo, transpose=False,
               executed_transpose=True, bytes_elem=BYTES,
               weight_bytes=None):
    """(flops, bytes, eff) for one conv (or conv_transpose).

    conv: flops = 2*B*Ho*Wo*cout*cin*k^2, input read at Ho*s x Wo*s.
    conv_transpose (s2): useful flops touch k^2/s^2 real taps per output
    pixel; XLA's zero-insertion lowering executes all k^2
    (executed_transpose=True matches what cost_analysis reports and what
    the MXU actually streams)."""
    if transpose:
        taps = k * k if executed_transpose else (k * k) / (s * s)
        flops = 2 * batch * ho * wo * cout * cin * taps
        in_px = (ho // s) * (wo // s)
        K = cin * (k * k if executed_transpose
                   else max(1, (k // s) * (k // s)))
    else:
        flops = 2 * batch * ho * wo * cout * cin * k * k
        in_px = (ho * s) * (wo * s)
        K = cin * k * k
    eff = (min(K, 128) / 128) * (min(cout, 128) / 128)
    wb = weight_bytes if weight_bytes is not None else bytes_elem
    bytes_ = (bytes_elem * batch * (cin * in_px + cout * ho * wo)
              + wb * cin * cout * k * k)
    return flops, bytes_, eff


def _accumulate(entries):
    """entries: iterable of (name, flops, bytes, eff). Returns totals."""
    tot = dict(flops=0.0, t=0.0, t_mxu=0.0, t_hbm=0.0, hbm_flops=0.0,
               rows=[])
    for name, flops, bytes_, eff in entries:
        t_mxu = flops / (PEAK * eff)
        t_hbm = bytes_ / HBM
        t = max(t_mxu, t_hbm)
        tot["flops"] += flops
        tot["t"] += t
        tot["t_mxu"] += t_mxu
        tot["t_hbm"] += t_hbm
        if t_hbm > t_mxu:
            tot["hbm_flops"] += flops
        tot["rows"].append((name, flops, t, t_hbm > t_mxu))
    return tot


def _fwd_entries(convs, batch, tag=""):
    for c in convs:
        transpose = len(c) == 8 and c[7]
        name, cin, cout, k, s, ho, wo = c[:7]
        flops, bytes_, eff = _conv_cost(batch, cin, cout, k, s, ho, wo,
                                        transpose=transpose)
        yield (tag + name, flops, bytes_, eff)


def _bwd_entries(convs, batch):
    """backward-data + backward-weight per conv.

    bwd-data: full-corr of dY with W^T — flops = fwd flops, reads dY at
    out-res + W, writes dX at in-res, reduction dim = cout*k^2, output
    channels = cin.
    bwd-weight: contraction of X with dY over batch*pixels (fills the MXU
    rows), output is the k^2*cin x cout weight grad written in f32."""
    for c in convs:
        name, cin, cout, k, s, ho, wo = c[:7]
        hi, wi = ho * s, wo * s
        # bwd-data (skip the stem: no dX needed for the input image)
        if cin > 3:
            flops = 2 * batch * hi * wi * cin * cout * k * k / (s * s)
            K = cout * (k * k) / (s * s)
            eff = (min(K, 128) / 128) * (min(cin, 128) / 128)
            bytes_ = (BYTES * batch * (cout * ho * wo + cin * hi * wi)
                      + BYTES * cin * cout * k * k)
            yield (name + ".bwd_x", flops, bytes_, eff)
        # bwd-weight: K = batch*ho*wo (huge, fills), out dims cin*k^2 x cout
        flops = 2 * batch * ho * wo * cout * cin * k * k
        eff = min(cout, 128) / 128  # reduction dim always fills
        bytes_ = (BYTES * batch * (cin * hi * wi + cout * ho * wo)
                  + 4 * cin * cout * k * k)  # f32 master grads
        yield (name + ".bwd_w", flops, bytes_, eff)


def _report(title, tot, batch, extra_bytes=0.0, top=8):
    t = tot["t"] + extra_bytes / HBM
    print(f"\n== {title} ==")
    print(f"conv flops/batch: {tot['flops'] / 1e12:.2f} TF")
    print(f"roofline time: {t * 1e3:.1f} ms  (pure-MXU "
          f"{tot['t_mxu'] * 1e3:.1f}, pure-HBM {tot['t_hbm'] * 1e3:.1f}"
          + (f", optimizer/update traffic {extra_bytes / HBM * 1e3:.1f} ms"
             if extra_bytes else "") + ")")
    print(f"ceiling rate: {batch / t:.1f} items/s")
    print(f"ceiling MFU vs 197TF peak: {tot['flops'] / t / PEAK:.3f}")
    print(f"flops in HBM-bound convs: {tot['hbm_flops'] / tot['flops']:.1%}")
    rows = sorted(tot["rows"], key=lambda r: -r[2])[:top]
    print(f"top-{top} layers by roofline time:")
    for name, flops, lt, hbm in rows:
        print(f"  {name:<22} {lt * 1e3:7.2f} ms  {flops / 1e9:8.1f} GF  "
              f"{'HBM' if hbm else 'MXU'}-bound")
    return t


def extract_main():
    batch = 8
    base = (768, 1024)
    shapes = [base,
              (int(base[0] / math.sqrt(2)), int(base[1] / math.sqrt(2))),
              (base[0] // 2, base[1] // 2)]
    entries = []
    for (h, w) in shapes:
        entries.extend(_fwd_entries(resnet101_convs(h, w),
                                    batch, tag=f"{h}x{w}."))
    tot = _accumulate(entries)
    print(f"shapes {shapes} batch {batch}")
    t = _report("extract: ResNet101-GeM fused multiscale fwd", tot, batch)
    meas_rate, meas_tf = 180.3, 79.4  # docs/bench_captures_r4.jsonl
    print(f"measured: {meas_rate} img/s -> "
          f"{meas_tf * 1e12 / PEAK:.3f} MFU; "
          f"fraction of roofline: {meas_rate / (batch / t):.2f}")


def train_main():
    # prepare_batch pads the 362-max-side tuples to the 32-multiple bucket
    # (384^2) — the compiled step's real geometry
    batch, hw = 35, (384, 384)
    convs = resnet101_convs(*hw)
    entries = list(_fwd_entries(convs, batch))
    entries += list(_bwd_entries(convs, batch))
    tot = _accumulate(entries)
    # SGD+momentum update: read p,m,g / write p,m on 42.5M f32 params
    n_params = sum(cin * cout * k * k for _, cin, cout, k, _, _, _ in convs)
    opt_bytes = 5 * 4 * n_params
    print(f"tuple geometry: {batch} images @ {hw[0]}x{hw[1]} "
          f"(5 tuples x 7 @ 362 padded to the 32-bucket; cirtorch "
          f"train.py defaults); remat OFF "
          f"({batch * hw[0] * hw[1] * 3 / 2**24:.2f} of the 2^24 gate)")
    t = _report("train: ResNet101 contrastive step fwd+bwd", tot, 5,
                extra_bytes=opt_bytes)
    fwd = _accumulate(list(_fwd_entries(convs, batch)))
    bwd = _accumulate(list(_bwd_entries(convs, batch)))
    print(f"split: fwd {fwd['t'] * 1e3:.1f} ms, bwd {bwd['t'] * 1e3:.1f} ms"
          f" (bwd/fwd flops ratio "
          f"{bwd['flops'] / fwd['flops']:.2f})")
    meas_tuples, meas_mfu = 65.4, 0.313  # BENCH_r04 driver capture
    print(f"measured: {meas_tuples} tuples/s resident = {meas_mfu} MFU; "
          f"fraction of roofline: {meas_tuples / (5 / t):.2f}")


def composed_main(executed_transpose=True):
    batch = 4  # BENCH_COMPOSED_BATCH default
    base = (768, 1024)
    div = 256
    entries = []
    for scale in (1.0, 1.0 / math.sqrt(2), 0.5):
        sh = int(math.floor(base[0] * scale)) if scale != 1 else base[0]
        sw = int(math.floor(base[1] * scale)) if scale != 1 else base[1]
        ph, pw = -(-sh // div) * div, -(-sw // div) * div
        tag = f"{ph}x{pw}."
        for c in p2p_unet_convs(ph, pw):
            name, cin, cout, k, s, ho, wo, tr = c
            flops, bytes_, eff = _conv_cost(
                batch, cin, cout, k, s, ho, wo, transpose=tr,
                executed_transpose=executed_transpose)
            entries.append((tag + "unet." + name, flops, bytes_, eff))
        entries.extend(_fwd_entries(vgg16_convs(ph, pw), batch, tag=tag))
    tot = _accumulate(entries)
    kind = "executed (zero-insertion)" if executed_transpose else "useful"
    print(f"\nconvT flop accounting: {kind}")
    t = _report(f"composed: p2p U-Net + VGG16-GeM 3-scale (batch {batch})",
                tot, batch)
    unet_flops = sum(f for n, f, _, _ in
                     ((r[0], r[1], 0, 0) for r in tot["rows"])
                     if ".unet." in n)
    print(f"U-Net share of flops: {unet_flops / tot['flops']:.1%}")
    meas_rate = 34.5  # docs/bench_captures_r4.jsonl composed resident
    print(f"measured: {meas_rate} img/s; fraction of roofline: "
          f"{meas_rate / (batch / t):.2f}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("extract", "all"):
        extract_main()
    if which in ("train", "all"):
        train_main()
    if which in ("composed", "all"):
        composed_main(executed_transpose=True)
        composed_main(executed_transpose=False)


if __name__ == "__main__":
    main()
