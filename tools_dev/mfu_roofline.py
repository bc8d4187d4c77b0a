"""Analytic per-layer roofline for ResNet101-GeM extraction (docs/MFU.md).

Computes, for every conv in the bench's fused multiscale extraction program
(batch 8, scales 1 / 0.707 / 0.5 of 768x1024), the MXU-bound time
(flops / effective peak) and the HBM-bound time (bytes / bandwidth), takes
the max per layer, and sums — an optimistic compiler-independent ceiling
(perfect fusion of BN/ReLU into the conv, zero overhead between kernels).

Effective peak accounts for MXU tiling: a contraction with K reduction
elements and C output channels only fills the 128x128 systolic array to
(min(K,128)/128) x (min(C,128)/128) when K or C < 128 (channel-dim padding;
spatial dims are large everywhere here so the batch/pixel dim always fills).

v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
"""
import math

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


def analyze(batch, shapes):
    tot_flops = tot_t = tot_mxu = tot_hbm = 0.0
    hbm_bound_flops = 0.0
    stem_t = 0.0
    for (h, w) in shapes:
        for name, cin, cout, k, s, ho, wo in resnet101_convs(h, w):
            flops = 2 * batch * ho * wo * cout * cin * k * k
            # im2col reduction size and output-channel tiling efficiency
            K = cin * k * k
            eff = (min(K, 128) / 128) * (min(cout, 128) / 128)
            t_mxu = flops / (PEAK * eff)
            bytes_ = BYTES * batch * (cin * (ho * s) * (wo * s)
                                      + cout * ho * wo) + BYTES * K * cout
            t_hbm = bytes_ / HBM
            t = max(t_mxu, t_hbm)
            tot_flops += flops
            tot_t += t
            tot_mxu += t_mxu
            tot_hbm += t_hbm
            if t_hbm > t_mxu:
                hbm_bound_flops += flops
            if name == "stem":
                stem_t += t
    return tot_flops, tot_t, tot_mxu, tot_hbm, hbm_bound_flops, stem_t


def main():
    batch = 8
    base = (768, 1024)
    shapes = [base,
              (int(base[0] / math.sqrt(2)), int(base[1] / math.sqrt(2))),
              (base[0] // 2, base[1] // 2)]
    flops, t, t_mxu, t_hbm, hbm_flops, stem_t = analyze(batch, shapes)
    print(f"shapes {shapes} batch {batch}")
    print(f"conv flops/batch: {flops / 1e12:.2f} TF")
    print(f"roofline time: {t * 1e3:.1f} ms  (pure-MXU {t_mxu * 1e3:.1f}, "
          f"pure-HBM {t_hbm * 1e3:.1f})")
    print(f"ceiling rate: {batch / t:.1f} img/s")
    print(f"ceiling MFU vs 197TF peak: {flops / t / PEAK:.3f}")
    print(f"flops in HBM-bound convs: {hbm_flops / flops:.1%}")
    print(f"stem share of time: {stem_t / t:.1%}")
    # measured numbers for comparison (bench captures)
    meas_rate, meas_tf = 164.2, 71.2
    print(f"measured: {meas_rate} img/s, {meas_tf} TF/s "
          f"-> {meas_tf * 1e12 / PEAK:.3f} MFU; "
          f"fraction of roofline: {meas_rate / (batch / t):.2f}")


if __name__ == "__main__":
    main()
