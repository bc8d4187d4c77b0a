/* Native CLAHE: bit-exact replication of cv2's uint8 CLAHE.
 *
 * The host preprocessing hot op (the paper's illumination normalization),
 * implemented as a CPython extension so the input pipeline has a native path
 * independent of OpenCV. Semantics identical to mdir_tpu.ops.clahe.clahe_u8_np
 * (verified by tests): BORDER_REFLECT_101 padding to the tile grid, per-tile
 * clipped histograms with uniform + strided-residual redistribution, LUTs
 * rounded half-to-even in float32, and float32 bilinear LUT interpolation.
 *
 * Build: python csrc/setup.py build_ext --inplace  (or see csrc/Makefile)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define HIST_SIZE 256

static inline int reflect101(int idx, int size) {
    /* cv2 BORDER_REFLECT_101 for one-sided right/bottom padding */
    if (idx < size) return idx;
    return 2 * size - idx - 2;
}

static void build_luts(const uint8_t *src, int h, int w, int ph, int pw,
                       int gh, int gw, double clip_limit, uint8_t *luts) {
    const int th = ph / gh, tw = pw / gw;
    const int tile_area = th * tw;
    int clim = (int)(clip_limit * tile_area / HIST_SIZE);
    if (clim < 1) clim = 1;
    const float scale = 255.0f / (float)tile_area;

    int *hist = (int *)malloc(HIST_SIZE * sizeof(int));
    for (int ty = 0; ty < gh; ty++) {
        for (int tx = 0; tx < gw; tx++) {
            memset(hist, 0, HIST_SIZE * sizeof(int));
            for (int y = ty * th; y < (ty + 1) * th; y++) {
                const int sy = reflect101(y, h);
                const uint8_t *row = src + (size_t)sy * w;
                for (int x = tx * tw; x < (tx + 1) * tw; x++) {
                    hist[row[reflect101(x, w)]]++;
                }
            }
            /* clip + redistribute */
            long clipped = 0;
            for (int i = 0; i < HIST_SIZE; i++) {
                if (hist[i] > clim) {
                    clipped += hist[i] - clim;
                    hist[i] = clim;
                }
            }
            const int batch = (int)(clipped / HIST_SIZE);
            int residual = (int)(clipped - (long)batch * HIST_SIZE);
            for (int i = 0; i < HIST_SIZE; i++) hist[i] += batch;
            if (residual) {
                int step = HIST_SIZE / residual;
                if (step < 1) step = 1;
                for (int i = 0; i < HIST_SIZE && residual > 0;
                     i += step, residual--) {
                    hist[i]++;
                }
            }
            /* cdf -> lut; numpy computes cdf*float32(scale) in double, casts
             * to float32, then rounds half-to-even */
            uint8_t *lut = luts + ((size_t)ty * gw + tx) * HIST_SIZE;
            long cdf = 0;
            for (int i = 0; i < HIST_SIZE; i++) {
                cdf += hist[i];
                float v = (float)((double)cdf * (double)scale);
                float r = rintf(v); /* default FP mode: round half to even */
                if (r < 0) r = 0;
                if (r > 255) r = 255;
                lut[i] = (uint8_t)r;
            }
        }
    }
    free(hist);
}

static void interpolate(const uint8_t *src, int h, int w, int gh, int gw,
                        int th, int tw, const uint8_t *luts, uint8_t *dst) {
    const float inv_th = (float)(1.0 / (double)th);
    const float inv_tw = (float)(1.0 / (double)tw);

    int *tx1a = (int *)malloc(w * sizeof(int));
    int *tx2a = (int *)malloc(w * sizeof(int));
    float *xaa = (float *)malloc(w * sizeof(float));
    for (int x = 0; x < w; x++) {
        const float txf = (float)x * inv_tw - 0.5f;
        int t1 = (int)floorf(txf);
        const float xa = txf - (float)t1;
        int t2 = t1 + 1;
        if (t1 < 0) t1 = 0;
        if (t1 > gw - 1) t1 = gw - 1;
        if (t2 < 0) t2 = 0;
        if (t2 > gw - 1) t2 = gw - 1;
        tx1a[x] = t1;
        tx2a[x] = t2;
        xaa[x] = xa;
    }

    for (int y = 0; y < h; y++) {
        const float tyf = (float)y * inv_th - 0.5f;
        int ty1 = (int)floorf(tyf);
        const float ya = tyf - (float)ty1;
        int ty2 = ty1 + 1;
        if (ty1 < 0) ty1 = 0;
        if (ty1 > gh - 1) ty1 = gh - 1;
        if (ty2 < 0) ty2 = 0;
        if (ty2 > gh - 1) ty2 = gh - 1;
        const float ya1 = 1.0f - ya;

        const uint8_t *srow = src + (size_t)y * w;
        uint8_t *drow = dst + (size_t)y * w;
        const uint8_t *lrow1 = luts + (size_t)ty1 * gw * HIST_SIZE;
        const uint8_t *lrow2 = luts + (size_t)ty2 * gw * HIST_SIZE;

        for (int x = 0; x < w; x++) {
            const uint8_t p = srow[x];
            const float xa = xaa[x];
            const float xa1 = 1.0f - xa;
            const float v11 = (float)lrow1[(size_t)tx1a[x] * HIST_SIZE + p];
            const float v12 = (float)lrow1[(size_t)tx2a[x] * HIST_SIZE + p];
            const float v21 = (float)lrow2[(size_t)tx1a[x] * HIST_SIZE + p];
            const float v22 = (float)lrow2[(size_t)tx2a[x] * HIST_SIZE + p];
            float res = (v11 * xa1 + v12 * xa) * ya1
                      + (v21 * xa1 + v22 * xa) * ya;
            float r = rintf(res);
            if (r < 0) r = 0;
            if (r > 255) r = 255;
            drow[x] = (uint8_t)r;
        }
    }
    free(tx1a);
    free(tx2a);
    free(xaa);
}

static PyObject *py_clahe_u8(PyObject *self, PyObject *args) {
    Py_buffer buf;
    int h, w, gh, gw;
    double clip_limit;
    if (!PyArg_ParseTuple(args, "y*iidii", &buf, &h, &w, &clip_limit,
                          &gh, &gw)) {
        return NULL;
    }
    if (buf.len < (Py_ssize_t)h * w) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer smaller than h*w");
        return NULL;
    }
    const uint8_t *src = (const uint8_t *)buf.buf;

    int ph = h, pw = w;
    if (h % gh || w % gw) {
        ph = h + (gh - h % gh);
        pw = w + (gw - w % gw);
    }
    const int th = ph / gh, tw = pw / gw;

    uint8_t *luts = (uint8_t *)malloc((size_t)gh * gw * HIST_SIZE);
    PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)h * w);
    if (!luts || !out) {
        free(luts);
        Py_XDECREF(out);
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }

    Py_BEGIN_ALLOW_THREADS
    build_luts(src, h, w, ph, pw, gh, gw, clip_limit, luts);
    interpolate(src, h, w, gh, gw, th, tw, luts,
                (uint8_t *)PyBytes_AS_STRING(out));
    Py_END_ALLOW_THREADS

    free(luts);
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef Methods[] = {
    {"clahe_u8", py_clahe_u8, METH_VARARGS,
     "clahe_u8(src_bytes, h, w, clip_limit, grid_h, grid_w) -> bytes"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_mdir_native", "Native host kernels for mdir-tpu",
    -1, Methods,
};

PyMODINIT_FUNC PyInit__mdir_native(void) {
    return PyModule_Create(&moduledef);
}
