/* Native host-runtime kernels for rna_algos_tpu.
 *
 * The device side of the framework is JAX/XLA; this module covers the
 * sequential host hot paths that the reference implements natively in Rust:
 *
 *  - centroid traceback (reference src/centroid_fold.rs:66-102): stack-based
 *    float-equality re-derivation over the device-produced f32 MEA fill.
 *    Inherently sequential per structure; runs once per (sequence, gamma) on
 *    the host, so a compiled implementation keeps the 18-gamma fan-out off
 *    the Python interpreter.
 *  - sparse probability formatting (reference bin/mccaskill_algo.rs:103-113):
 *    "i,j,p " triple emission with Rust-Display-compatible shortest f32 repr.
 *
 * All float arithmetic is single precision to bit-match the device fill and
 * the reference's f32 semantics.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdio.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* centroid traceback                                                  */
/* ------------------------------------------------------------------ */

typedef struct {
    int32_t i, j;
} PosPair;

/* Mirrors centroid_fold.rs:66-102 exactly: candidate order, float equality,
 * stack discipline. M and bpp are row-major (stride x stride), n <= stride. */
static Py_ssize_t traceback_core(const float *M, const float *bpp,
                                 Py_ssize_t stride, Py_ssize_t n, float gamma,
                                 PosPair *out, PosPair *stack)
{
    Py_ssize_t sp = 0, npairs = 0;
    stack[sp].i = 0;
    stack[sp].j = (int32_t)(n - 1);
    sp++;
    while (sp > 0) {
        sp--;
        Py_ssize_t i = stack[sp].i, j = stack[sp].j;
        if (j <= i) continue;
        float m = M[i * stride + j];
        if (m == 0.0f) continue;
        if (m == M[(i + 1) * stride + j]) {
            stack[sp].i = (int32_t)(i + 1);
            stack[sp].j = (int32_t)j;
            sp++;
        } else if (m == M[i * stride + (j - 1)]) {
            stack[sp].i = (int32_t)i;
            stack[sp].j = (int32_t)(j - 1);
            sp++;
        } else if (bpp[i * stride + j] > 0.0f &&
                   m == M[(i + 1) * stride + (j - 1)] +
                            gamma * bpp[i * stride + j] - 1.0f) {
            stack[sp].i = (int32_t)(i + 1);
            stack[sp].j = (int32_t)(j - 1);
            sp++;
            out[npairs].i = (int32_t)i;
            out[npairs].j = (int32_t)j;
            npairs++;
        } else {
            for (Py_ssize_t k = i + 1; k < j; k++) {
                if (m == M[i * stride + k] + M[(k + 1) * stride + j]) {
                    stack[sp].i = (int32_t)i;
                    stack[sp].j = (int32_t)k;
                    sp++;
                    stack[sp].i = (int32_t)(k + 1);
                    stack[sp].j = (int32_t)j;
                    sp++;
                    break;
                }
            }
        }
    }
    return npairs;
}

/* traceback(M_bytes, bpp_bytes, stride, n, gamma) -> list[(i, j)] */
static PyObject *py_traceback(PyObject *self, PyObject *args)
{
    Py_buffer mbuf, pbuf;
    Py_ssize_t stride, n;
    float gamma;
    if (!PyArg_ParseTuple(args, "y*y*nnf", &mbuf, &pbuf, &stride, &n, &gamma))
        return NULL;
    if (mbuf.len < stride * stride * (Py_ssize_t)sizeof(float) ||
        pbuf.len < stride * stride * (Py_ssize_t)sizeof(float) || n > stride) {
        PyBuffer_Release(&mbuf);
        PyBuffer_Release(&pbuf);
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        return NULL;
    }
    PosPair *out = (PosPair *)PyMem_Malloc(sizeof(PosPair) * (size_t)(n + 1));
    PosPair *stack = (PosPair *)PyMem_Malloc(sizeof(PosPair) * (size_t)(2 * n + 4));
    if (!out || !stack) {
        PyMem_Free(out);
        PyMem_Free(stack);
        PyBuffer_Release(&mbuf);
        PyBuffer_Release(&pbuf);
        return PyErr_NoMemory();
    }
    Py_ssize_t npairs = traceback_core((const float *)mbuf.buf,
                                       (const float *)pbuf.buf, stride, n,
                                       gamma, out, stack);
    PyObject *list = PyList_New(npairs);
    if (list) {
        for (Py_ssize_t k = 0; k < npairs; k++) {
            PyObject *t = Py_BuildValue("(ii)", out[k].i, out[k].j);
            if (!t) {
                Py_CLEAR(list);
                break;
            }
            PyList_SET_ITEM(list, k, t);
        }
    }
    PyMem_Free(out);
    PyMem_Free(stack);
    PyBuffer_Release(&mbuf);
    PyBuffer_Release(&pbuf);
    return list;
}

/* ------------------------------------------------------------------ */
/* shortest round-trip f32 formatting (Rust `{}` Display equivalent)   */
/* ------------------------------------------------------------------ */

static void fmt_f32(float v, char *buf, size_t cap)
{
    if (v != v || v * 0.0f != 0.0f) { /* nan/inf: not produced by the DPs */
        snprintf(buf, cap, "%g", (double)v);
        return;
    }
    /* shortest positional fixed-point that round-trips the f32 — the same
     * definition as Rust's `{}` Display / numpy format_float_positional */
    for (int prec = 0; prec <= 60; prec++) {
        snprintf(buf, cap, "%.*f", prec, (double)v);
        if ((float)strtod(buf, NULL) == v) break;
    }
}

/* probs2str(i_arr, j_arr, p_bytes, count) -> str ("i,j,p " triples) */
static PyObject *py_probs2str(PyObject *self, PyObject *args)
{
    Py_buffer ibuf, jbuf, pbuf;
    Py_ssize_t count;
    if (!PyArg_ParseTuple(args, "y*y*y*n", &ibuf, &jbuf, &pbuf, &count))
        return NULL;
    if (ibuf.len < count * (Py_ssize_t)sizeof(int32_t) ||
        jbuf.len < count * (Py_ssize_t)sizeof(int32_t) ||
        pbuf.len < count * (Py_ssize_t)sizeof(float)) {
        PyBuffer_Release(&ibuf);
        PyBuffer_Release(&jbuf);
        PyBuffer_Release(&pbuf);
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        return NULL;
    }
    const int32_t *iv = (const int32_t *)ibuf.buf;
    const int32_t *jv = (const int32_t *)jbuf.buf;
    const float *pv = (const float *)pbuf.buf;
    size_t cap = (size_t)count * 64 + 16;
    char *text = (char *)PyMem_Malloc(cap);
    if (!text) {
        PyBuffer_Release(&ibuf);
        PyBuffer_Release(&jbuf);
        PyBuffer_Release(&pbuf);
        return PyErr_NoMemory();
    }
    size_t pos = 0;
    char num[64];
    for (Py_ssize_t k = 0; k < count; k++) {
        fmt_f32(pv[k], num, sizeof(num));
        int wrote = snprintf(text + pos, cap - pos, "%d,%d,%s ", iv[k], jv[k], num);
        pos += (size_t)wrote;
    }
    PyObject *s = PyUnicode_FromStringAndSize(text, (Py_ssize_t)pos);
    PyMem_Free(text);
    PyBuffer_Release(&ibuf);
    PyBuffer_Release(&jbuf);
    PyBuffer_Release(&pbuf);
    return s;
}

static PyMethodDef methods[] = {
    {"traceback", py_traceback, METH_VARARGS,
     "Centroid traceback over a float32 MEA fill (centroid_fold.rs:66-102)."},
    {"probs2str", py_probs2str, METH_VARARGS,
     "Sparse 'i,j,p ' triple formatting (bin/mccaskill_algo.rs:103-113)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "rna_algos_native",
    "Native host-runtime kernels for rna_algos_tpu.", -1, methods,
};

PyMODINIT_FUNC PyInit_rna_algos_native(void) { return PyModule_Create(&module); }
