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
//
// Model info:  slt_model_n_vocab/n_embd/n_layer/n_head/n_ctx_train,
//              slt_model_meta(key), slt_model_desc
// Vocab:       slt_vocab_bos/eos, slt_vocab_is_eog, slt_token_to_piece
// Decode:      slt_decode_ctx_new, slt_decode(tokens), slt_get_logits,
//              slt_decode_reset   (llama_decode / llama_get_logits tier)
// Samplers:    slt_sampler_new(json cfg), slt_sampler_sample(logits),
//              slt_sampler_accept/reset  (llama_sampler_chain tier)
// State I/O:   slt_state_get_size/get_data/set_data,
//              slt_state_save_file/load_file, slt_kv_clear
//              (llama_state_seq_* tier over engine slots)
// Embeddings:  slt_embedder_new, slt_embed (pooled, encoder archs)
//
// THREADING: every entry point takes the embedded interpreter's GIL, so
// concurrent host threads SERIALIZE through this ABI (the device work a
// call dispatches still overlaps asynchronously, but the Python-side
// prologue/epilogue of one call blocks the others). A multi-threaded host
// should multiplex requests onto one engine (the Engine batches slots
// internally and is thread-safe) rather than calling slt_decode from many
// threads expecting parallel speedup. Measured in
// tests/test_capi.py::test_threaded_decode_throughput.

#include <Python.h>

#include <cstdarg>
#include <cstdint>
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

// ---------------------- model info / vocab getters ------------------------
// llama_model_* / llama_vocab_* (include/llama.h:455-560, 960-1015)

namespace {

long long call_ll(const char* err, const char* fn, const char* fmt, ...) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    va_list va;
    va_start(va, fmt);
    PyObject* args = Py_VaBuildValue(fmt, va);
    va_end(va);
    if (!args) {
        set_err(err);
        return -1;
    }
    PyObject* name = PyUnicode_FromString(fn);
    PyObject* meth = PyObject_GetAttr(mod, name);
    Py_DECREF(name);
    PyObject* r = meth ? PyObject_CallObject(meth, args) : nullptr;
    Py_XDECREF(meth);
    Py_DECREF(args);
    if (!r) {
        set_err(err);
        return -1;
    }
    long long v = PyLong_AsLongLong(r);
    Py_DECREF(r);
    return v;
}

int copy_str(PyObject* r, char* buf, int cap, const char* err) {
    if (!r) {
        set_err(err);
        return -1;
    }
    Py_ssize_t len = 0;
    const char* s;
    if (PyBytes_Check(r)) {
        s = PyBytes_AsString(r);
        len = PyBytes_Size(r);
    } else {
        s = PyUnicode_AsUTF8AndSize(r, &len);
    }
    int ncopy = (int)(len < cap - 1 ? len : cap - 1);
    if (ncopy > 0) std::memcpy(buf, s, ncopy);
    if (cap > 0) buf[ncopy < 0 ? 0 : ncopy] = 0;
    Py_DECREF(r);
    return (int)len;
}

}  // namespace

int slt_model_n_vocab(long long m) { return (int)call_ll("model_int", "model_int", "(Ls)", m, "n_vocab"); }
int slt_model_n_embd(long long m) { return (int)call_ll("model_int", "model_int", "(Ls)", m, "n_embd"); }
int slt_model_n_layer(long long m) { return (int)call_ll("model_int", "model_int", "(Ls)", m, "n_layer"); }
int slt_model_n_head(long long m) { return (int)call_ll("model_int", "model_int", "(Ls)", m, "n_head"); }
int slt_model_n_ctx_train(long long m) { return (int)call_ll("model_int", "model_int", "(Ls)", m, "n_ctx_train"); }

int slt_model_meta(long long m, const char* key, char* buf, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    return copy_str(PyObject_CallMethod(mod, "model_meta", "Ls", m, key),
                    buf, cap, "model_meta");
}

int slt_model_desc(long long m, char* buf, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    return copy_str(PyObject_CallMethod(mod, "model_desc", "L", m),
                    buf, cap, "model_desc");
}

int slt_vocab_bos(long long m) { return (int)call_ll("vocab", "vocab_special", "(Ls)", m, "bos_id"); }
int slt_vocab_eos(long long m) { return (int)call_ll("vocab", "vocab_special", "(Ls)", m, "eos_id"); }
int slt_vocab_is_eog(long long m, int tok) { return (int)call_ll("vocab", "vocab_is_eog", "(Li)", m, tok); }

int slt_token_to_piece(long long m, int tok, char* buf, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    return copy_str(PyObject_CallMethod(mod, "token_to_piece", "Li", m, tok),
                    buf, cap, "token_to_piece");
}

// ------------------------------ decode tier --------------------------------
// llama_decode / llama_get_logits over a raw context (custom C loops)

long long slt_decode_ctx_new(long long model, int n_ctx) {
    long long h = call_ll("decode_ctx_new", "decode_ctx_new", "(Li)", model, n_ctx);
    return h < 0 ? 0 : h;
}

int slt_decode(long long dctx, const int* tokens, int n) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* lst = PyList_New(n);
    for (int i = 0; i < n; i++)
        PyList_SetItem(lst, i, PyLong_FromLong(tokens[i]));
    PyObject* r = PyObject_CallMethod(mod, "decode", "LO", dctx, lst);
    Py_DECREF(lst);
    if (!r) {
        set_err("decode");
        return -1;
    }
    int n_past = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return n_past;
}

// copies up to cap floats of the last position's logits; returns n_vocab
int slt_get_logits(long long dctx, float* out, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* r = PyObject_CallMethod(mod, "get_logits", "L", dctx);
    if (!r) {
        set_err("get_logits");
        return -1;
    }
    Py_ssize_t nbytes = PyBytes_Size(r);
    int n = (int)(nbytes / 4);
    int ncopy = n < cap ? n : cap;
    std::memcpy(out, PyBytes_AsString(r), (size_t)ncopy * 4);
    Py_DECREF(r);
    return n;
}

int slt_decode_reset(long long dctx) {
    return (int)call_ll("decode_reset", "decode_reset", "(L)", dctx);
}

// ------------------------------ sampler tier -------------------------------
// llama_sampler_chain_*: config as a JSON object of make_chain kwargs
// ({"temp":0.8,"top_k":40,...}); empty string = defaults

long long slt_sampler_new(const char* cfg_json) {
    long long h = call_ll("sampler_new", "sampler_new", "(s)", cfg_json);
    return h < 0 ? 0 : h;
}

int slt_sampler_sample(long long sampler, const float* logits, int n) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* b = PyBytes_FromStringAndSize((const char*)logits,
                                            (Py_ssize_t)n * 4);
    PyObject* r = PyObject_CallMethod(mod, "sampler_sample", "LO", sampler, b);
    Py_DECREF(b);
    if (!r) {
        set_err("sampler_sample");
        return -1;
    }
    int tok = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return tok;
}

int slt_sampler_accept(long long sampler, int tok) {
    return (int)call_ll("sampler_accept", "sampler_accept", "(Li)", sampler, tok);
}

int slt_sampler_reset(long long sampler) {
    return (int)call_ll("sampler_reset", "sampler_reset", "(L)", sampler);
}

// ------------------------------- state tier --------------------------------
// llama_state_seq_get_size/get_data/set_data + save/load_file
// (include/llama.h:795-896) over engine slot snapshots

long long slt_state_get_size(long long ctx, int slot) {
    return call_ll("state_get_size", "state_get_size", "(Li)", ctx, slot);
}

long long slt_state_get_data(long long ctx, int slot, uint8_t* buf,
                             long long cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* r = PyObject_CallMethod(mod, "state_get_data", "Li", ctx, slot);
    if (!r) {
        set_err("state_get_data");
        return -1;
    }
    Py_ssize_t n = PyBytes_Size(r);
    if (n > cap) {
        Py_DECREF(r);
        g_err = "state_get_data: buffer too small";
        return -1;
    }
    std::memcpy(buf, PyBytes_AsString(r), n);
    Py_DECREF(r);
    return (long long)n;
}

int slt_state_set_data(long long ctx, int slot, const uint8_t* buf,
                       long long n) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* b = PyBytes_FromStringAndSize((const char*)buf, (Py_ssize_t)n);
    PyObject* r = PyObject_CallMethod(mod, "state_set_data", "LiO", ctx, slot, b);
    Py_DECREF(b);
    if (!r) {
        set_err("state_set_data");
        return -1;
    }
    int n_past = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return n_past;
}

long long slt_state_save_file(long long ctx, int slot, const char* path) {
    return call_ll("state_save_file", "state_save_file", "(Lis)", ctx, slot, path);
}

int slt_state_load_file(long long ctx, int slot, const char* path) {
    return (int)call_ll("state_load_file", "state_load_file", "(Lis)", ctx, slot, path);
}

int slt_kv_clear(long long ctx, int slot) {
    return (int)call_ll("kv_clear", "kv_clear", "(Li)", ctx, slot);
}

// ----------------------------- embedding tier ------------------------------

long long slt_embedder_new(long long model) {
    long long h = call_ll("embedder_new", "embedder_new", "(L)", model);
    return h < 0 ? 0 : h;
}

// copies up to cap floats of the pooled embedding; returns n_embd
int slt_embed(long long embedder, const char* text, float* out, int cap) {
    Gil gil;
    PyObject* mod = api_module();
    if (!mod) return -1;
    PyObject* r = PyObject_CallMethod(mod, "embed", "Ls", embedder, text);
    if (!r) {
        set_err("embed");
        return -1;
    }
    Py_ssize_t nbytes = PyBytes_Size(r);
    int n = (int)(nbytes / 4);
    int ncopy = n < cap ? n : cap;
    std::memcpy(out, PyBytes_AsString(r), (size_t)ncopy * 4);
    Py_DECREF(r);
    return n;
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
