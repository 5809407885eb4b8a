"""HTTP serving surface (S7): the reference's Flask app re-hosted over
the Spark-backed facade.

Route-for-route mirror of the reference `app.py:16-94` — `/` (frontend),
`/initialize` (construct the engine with user-selected models),
`/embed` (vectorize a file or folder), `/search` (run a query) — with
the same JSON request/response envelopes and the same status-code
discipline (400 for client errors including uninitialized-engine calls,
500 for search-time failures, `app.py:52,70,95`). Differences by
design:

- The engine behind the routes is `api.VectorDatabase` (parquet chunk
  store + lazy Spark plans), not the reference's in-memory pandas class,
  so the server is a THIN control plane: every request marshals JSON and
  delegates; all data work stays in Spark. At scale this process holds
  no table state — it can sit in front of a remote cluster unchanged.
- Model names route through the engine's backend registries
  (`TEXT_EMBED_MODELS` / `GEN_BACKENDS`); the reference's
  image/captioning model slots and API keys are ACCEPTED for request
  parity but unused here (the in-container embedders are the
  deterministic correctness-path backends; real models plug into the
  same slots — functions/backends.py).
- The reference validates images by base64 round-trip
  (`app.py:78-85`); here `b64decode(validate=True)` does the same check
  without re-encoding.
- One deliberate parity quirk kept: `/search` REQUIRES query text even
  for image-only searches (`app.py:73-74` — "Search query text is
  required."), although the underlying engine supports image-only
  queries (`rag.run_search`).

Serving is explicitly NOT the engine's north star (SURVEY §2.1: batch,
not online serving) — this module exists so a user of the reference can
point their existing HTTP client at the Spark engine; it adds no
operator semantics of its own. Tested with Flask's test client
(tests/test_app.py), no network required.
"""

from __future__ import annotations

import base64

from flask import Flask, jsonify, request

def _index_html() -> str:
    """No-code frontend covering the reference's ``templates/index.html``
    capabilities (model pickers → /initialize, file/folder path →
    /embed, query box → /search with response + expandable sources) as
    an ORIGINAL single page — the model <option>s are rendered from the
    live backend registries so the picker can never drift from the
    engine. API-key fields are omitted on purpose: the in-container
    backends take none, and remote-model keys belong in server config,
    not a browser form."""
    from .api import TEXT_EMBED_MODELS
    from .functions.llm_backends import GEN_BACKENDS

    text_opts = "".join(
        f'<option value="{m}"{" selected" if m == "local-hash-64" else ""}>'
        f"{m}</option>"
        for m in sorted(TEXT_EMBED_MODELS)
    )
    resp_opts = "".join(
        f'<option value="{m}"{" selected" if m == "stub" else ""}>'
        f"{m}</option>"
        for m in sorted(GEN_BACKENDS)
    )
    return f"""<!doctype html>
<html><head><meta charset="utf-8">
<title>vector_database_app_spark</title>
<style>
  body {{ font-family: system-ui, sans-serif; max-width: 46rem;
         margin: 2rem auto; padding: 0 1rem; color: #1a1a2e; }}
  fieldset {{ border: 1px solid #c9c9d4; border-radius: 6px;
              margin-bottom: 1rem; }}
  label {{ display: inline-block; min-width: 11rem; }}
  input[type=text], select {{ width: 24rem; max-width: 90%;
                              padding: .25rem; }}
  button {{ padding: .35rem .9rem; cursor: pointer; }}
  #status {{ white-space: pre-wrap; color: #3a3a5c; }}
  .src {{ border-left: 3px solid #c9c9d4; margin: .4rem 0;
          padding: .2rem .6rem; font-size: .9rem; }}
  details {{ margin-top: .6rem; }}
</style></head>
<body>
<h1>vector_database_app_spark</h1>

<fieldset><legend>1 · Initialize</legend>
  <label for="text_model">Text embedding model</label>
  <select id="text_model">{text_opts}</select><br>
  <label for="response_model">Response model</label>
  <select id="response_model">{resp_opts}</select><br>
  <label for="save_dir">Save directory</label>
  <input type="text" id="save_dir" value="vector_db"><br>
  <button onclick="call('/initialize', {{
      save_dir: val('save_dir'), text_model: val('text_model'),
      response_model: val('response_model')}})">Initialize</button>
</fieldset>

<fieldset><legend>2 · Embed</legend>
  <label for="embed_path">Server file/folder path</label>
  <input type="text" id="embed_path"><br>
  <label for="is_folder">Path is a folder</label>
  <input type="checkbox" id="is_folder" checked><br>
  <button onclick="call('/embed', {{
      path: val('embed_path'),
      is_folder: document.getElementById('is_folder').checked}})">
    Embed</button>
</fieldset>

<fieldset><legend>3 · Search</legend>
  <label for="query_text">Query</label>
  <input type="text" id="query_text"><br>
  <label for="search_location">Scope to location (optional)</label>
  <input type="text" id="search_location"><br>
  <button onclick="search()">Search</button>
</fieldset>

<div id="status"></div>
<div id="answer"></div>
<div id="sources"></div>

<script>
const val = id => document.getElementById(id).value.trim();
async function call(route, body) {{
  const st = document.getElementById('status');
  st.textContent = 'working…';
  const r = await fetch(route, {{method: 'POST',
    headers: {{'Content-Type': 'application/json'}},
    body: JSON.stringify(body)}});
  const j = await r.json();
  st.textContent = r.ok ? (j.message || JSON.stringify(j))
                        : ('error: ' + (j.error || r.status));
  return r.ok ? j : null;
}}
async function search() {{
  const body = {{query: {{text: val('query_text')}}}};
  const loc = val('search_location');
  if (loc) body.search_location = loc;
  const j = await call('/search', body);
  const ans = document.getElementById('answer');
  const src = document.getElementById('sources');
  ans.textContent = ''; src.innerHTML = '';
  if (!j) return;
  ans.textContent = j.response || '';
  if (j.sources && j.sources.length) {{
    const d = document.createElement('details');
    d.innerHTML = '<summary>Sources (' + j.sources.length
                + ')</summary>';
    for (const s of j.sources) {{
      const div = document.createElement('div');
      div.className = 'src';
      div.textContent = s.doc_name + ' · page ' + s.page_num + ' · '
                      + s.content_type + ' — '
                      + String(s.content_raw).slice(0, 200);
      d.appendChild(div);
    }}
    src.appendChild(d);
  }}
}}
</script>
</body></html>"""


def create_app(spark=None) -> Flask:
    """App factory: build the Flask app around one SparkSession. Pass an
    existing session (tests do); default constructs the engine session
    lazily on first `/initialize` so importing this module never starts
    a JVM."""
    app = Flask(__name__)
    state: dict = {"vec": None, "spark": spark}

    def _spark():
        if state["spark"] is None:
            from .session import get_spark

            state["spark"] = get_spark("serve")
        return state["spark"]

    @app.route("/")
    def index():
        return _index_html()

    @app.route("/initialize", methods=["POST"])
    def initialize_vector_db():
        """Reference `/initialize` (app.py:16-40): construct the engine
        with user-selected models; image/captioning models and API keys
        are accepted for request parity (unused in-container)."""
        from .api import VectorDatabase

        data = request.json or {}
        save_dir = data.get("save_dir") or "vector_db"
        try:
            state["vec"] = VectorDatabase(
                _spark(),
                save_dir,
                text_embedding_model=data.get(
                    "text_model", "local-hash-64"
                ),
                response_model=data.get("response_model", "stub"),
            )
            return jsonify(
                {
                    "message": "VectorDatabase initialized successfully "
                    f"with save_dir: {save_dir}!"
                }
            )
        except Exception as e:  # noqa: BLE001 — route boundary
            return jsonify({"error": str(e)}), 400

    @app.route("/embed", methods=["POST"])
    def embed():
        """Reference `/embed` (app.py:42-60): vectorize a file or folder
        into the store; 400 when the engine is uninitialized."""
        data = request.json or {}
        path = data.get("path")
        vec = state["vec"]
        if not vec:
            return (
                jsonify(
                    {
                        "error": "VectorDatabase is not initialized. "
                        "Please select models first."
                    }
                ),
                400,
            )
        try:
            if data.get("is_folder"):
                n = vec.vectorize_folder(path)
            else:
                n = vec.vectorize_file(path)
            kind = "folder" if data.get("is_folder") else "file"
            return jsonify(
                {
                    "message": f"Successfully embedded {kind}: {path}",
                    # extension over the reference: the engine knows how
                    # many NEW chunk rows landed (idempotent by hash)
                    "new_chunks": n,
                }
            )
        except Exception as e:  # noqa: BLE001 — route boundary
            return jsonify({"error": str(e)}), 400

    @app.route("/search", methods=["POST"])
    def search():
        """Reference `/search` (app.py:62-96): run a text (+ optional
        base64-image) query; 400 for missing init/text/invalid image,
        500 for engine failures, 200 with the reference response shape
        ``{"response": str, "sources": [...]}``."""
        data = request.json or {}
        query = data.get("query", {})
        search_location = data.get("search_location")
        vec = state["vec"]
        if not vec:
            return (
                jsonify(
                    {
                        "error": "VectorDatabase is not initialized. "
                        "Please initialize it first."
                    }
                ),
                400,
            )
        if not query.get("text"):
            # parity quirk kept from app.py:73-74 (see module docstring)
            return jsonify({"error": "Search query text is required."}), 400
        try:
            for image in query.get("image", []):
                try:
                    base64.b64decode(image, validate=True)
                except Exception as e:  # noqa: BLE001 — route boundary
                    return (
                        jsonify({"error": f"Invalid image format: {e}"}),
                        400,
                    )
            response = vec.run_search(
                search_content=query, search_location=search_location
            )
            return jsonify(response), 200
        except Exception as e:  # noqa: BLE001 — route boundary
            return jsonify({"error": str(e)}), 500

    return app


#: module-level app for `flask --app vector_database_app_spark.app run`
#: parity with the reference's `python app.py` entry point
app = create_app()

if __name__ == "__main__":  # pragma: no cover — manual entry point
    app.run(debug=False)
