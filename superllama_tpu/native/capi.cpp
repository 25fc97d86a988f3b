// C ABI for superllama_tpu (include/llama.h counterpart, SURVEY §2.3):
// a stable C surface over the Python runtime via the embedded interpreter.
// Host apps link libsuperllama_capi.so and never touch Python; inside a
// Python process (tests) the existing interpreter is reused.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC capi.cpp -o libsuperllama_capi.so \
//            $(python3-config --includes --ldflags --embed)
//
//   slt_backend_init()                 — start the runtime
//   slt_model_load(path)   -> handle   — GGUF load (llama_model_load_from_file)
//   slt_ctx_new(h, n_ctx)  -> handle   — engine (llama_init_from_model)
//   slt_tokenize(h, text, out, cap)    — llama_tokenize
//   slt_detokenize(h, ids, n, buf, cap)
//   slt_generate(ctx, prompt, max_tokens, temp, buf, cap) — full pipeline
//   slt_free(handle), slt_last_error()

#include <Python.h>

#include <cstring>
#include <mutex>
#include <string>

namespace {

std::mutex g_mu;
std::string g_err;
bool g_owns_interp = false;

void set_err(const char* where) {
    PyObject *type = nullptr, *val = nullptr, *tb = nullptr;
    PyErr_Fetch(&type, &val, &tb);
    g_err = std::string(where) + ": ";
    if (val) {
        PyObject* s = PyObject_Str(val);
        if (s) {
            g_err += PyUnicode_AsUTF8(s);
            Py_DECREF(s);
        }
    }
    Py_XDECREF(type);
    Py_XDECREF(val);
    Py_XDECREF(tb);
}

struct Gil {
    PyGILState_STATE st;
    Gil() : st(PyGILState_Ensure()) {}
    ~Gil() { PyGILState_Release(st); }
};

PyObject* api_module() {
    static PyObject* mod = nullptr;
    if (!mod) {
        mod = PyImport_ImportModule("superllama_tpu.native.capi_impl");
        if (!mod) set_err("import capi_impl");
    }
    return mod;
}

}  // namespace

extern "C" {

const char* slt_last_error(void) { return g_err.c_str(); }

int slt_backend_init(void) {
    std::lock_guard<std::mutex> lk(g_mu);
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
        g_owns_interp = true;
    }
    Gil gil;
    return api_module() ? 0 : -1;
}

void slt_backend_free(void) {
    // interpreter teardown is intentionally skipped when embedded in a host
    // app (finalization with live JAX runtimes is not worth the risk)
}

// returns an opaque handle (>0) or 0 on error
long long slt_model_load(const char* path) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return 0;
    PyObject* r = PyObject_CallMethod(mod, "model_load", "s", path);
    if (!r) {
        set_err("model_load");
        return 0;
    }
    long long h = PyLong_AsLongLong(r);
    Py_DECREF(r);
    return h;
}

long long slt_ctx_new(long long model, int n_ctx, int n_slots) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return 0;
    PyObject* r = PyObject_CallMethod(mod, "ctx_new", "Lii", model, n_ctx, n_slots);
    if (!r) {
        set_err("ctx_new");
        return 0;
    }
    long long h = PyLong_AsLongLong(r);
    Py_DECREF(r);
    return h;
}

int slt_tokenize(long long model, const char* text, int* out, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* r = PyObject_CallMethod(mod, "tokenize", "Ls", model, text);
    if (!r) {
        set_err("tokenize");
        return -1;
    }
    int n = (int)PyList_Size(r);
    for (int i = 0; i < n && i < cap; i++)
        out[i] = (int)PyLong_AsLong(PyList_GetItem(r, i));
    Py_DECREF(r);
    return n;
}

int slt_detokenize(long long model, const int* ids, int n, char* buf, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* lst = PyList_New(n);
    for (int i = 0; i < n; i++) PyList_SetItem(lst, i, PyLong_FromLong(ids[i]));
    PyObject* r = PyObject_CallMethod(mod, "detokenize", "LO", model, lst);
    Py_DECREF(lst);
    if (!r) {
        set_err("detokenize");
        return -1;
    }
    Py_ssize_t len = 0;
    const char* s = PyUnicode_AsUTF8AndSize(r, &len);
    int ncopy = (int)(len < cap - 1 ? len : cap - 1);
    std::memcpy(buf, s, ncopy);
    buf[ncopy] = 0;
    Py_DECREF(r);
    return (int)len;
}

int slt_generate(long long ctx, const char* prompt, int max_tokens,
                 float temp, char* buf, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* r = PyObject_CallMethod(mod, "generate", "Lsif", ctx, prompt,
                                      max_tokens, (double)temp);
    if (!r) {
        set_err("generate");
        return -1;
    }
    Py_ssize_t len = 0;
    const char* s = PyUnicode_AsUTF8AndSize(r, &len);
    int ncopy = (int)(len < cap - 1 ? len : cap - 1);
    std::memcpy(buf, s, ncopy);
    buf[ncopy] = 0;
    Py_DECREF(r);
    return (int)len;
}

int slt_free(long long handle) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* r = PyObject_CallMethod(mod, "free_handle", "L", handle);
    if (!r) {
        set_err("free");
        return -1;
    }
    Py_DECREF(r);
    return 0;
}

}  // extern "C"
