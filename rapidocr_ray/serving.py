"""Thin HTTP serving shim over the library surface (S-serving).

Route parity with the reference's two servers — the batch engine
(pipelines.extract) remains the primary surface; this shim exists so
the last reference entry points have a drop-in analog:

- ``GET /`` + ``POST /ocr`` — the single-model web app
  (ocrweb/rapidocr_web/ocrweb.py:18-28): POST body is JSON
  ``{"file": "data:image/...;base64,..."}``; the response is the
  ``WebReturn`` dict (task.py:23-66): rendered image (base64), total
  elapse, per-stage elapses, and the ``[(idx, text, score), ...]``
  rec table as JSON.
- ``GET /lang`` + ``GET|POST /api/ocr`` — the multi-language server
  (ocrweb_multi/main.py:30-62): optional token auth (403 on mismatch),
  ``lang`` / ``detect`` / ``classify`` query params, multipart
  ``image`` file (400 ``no image`` when missing), response
  ``{"msg": "OK", "data": {"ts": ..., "results": [...]}}``.

Per-request work runs the single-process oracle path
(``compat.RapidOCR``) — a serving request is one document, not a
Dataset job.  Images are RBMP (the engine's codec-free bitmap format)
or raw HTML bytes; jpeg/png route through the same typed codec stubs
as the batch path.  Flask is optional: ``create_app`` raises a typed
ImportError when it is absent so the library import stays clean.
"""

from __future__ import annotations

import base64
import json
import time

from rapidocr_ray.compat import RapidOCR
from rapidocr_ray.sources.writers import (
    decode_data_url,
    render_boxes,
    result_to_json,
)

MAX_CONTENT_LENGTH = 3 * 1024 * 1024  # ocrweb.py:15 upload cap


def parse_bool(value) -> bool:
    """ocrweb_multi/utils/utils.py parse_bool analog."""
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("true", "1", "yes", "on")


def _web_return(ocr, payload: bytes, lang: str) -> dict:
    """OCRWebUtils.get_web_result analog (task.py:39-66): run the
    pipeline, burn det boxes into the page, stringify elapses."""
    result, elapses = ocr(payload, lang=lang)
    if result is None:
        return {
            "image": base64.b64encode(payload).decode(),
            "total_elapse": "0.0000",
            "elapse_part": "",
            "rec_res": json.dumps([], indent=2, ensure_ascii=False),
        }
    rec_res = [
        (i, text, score) for i, (_box, text, score) in enumerate(result)
    ]
    boxes = [box for box, _t, _s in result if box is not None]
    from rapidocr_ray.functions.codecs import decode_page_image, encode_png
    from rapidocr_ray.glyphs import encode_rbmp, is_rbmp

    if boxes:
        try:
            img = render_boxes(decode_page_image(payload), boxes)
            # RBMP in -> RBMP out; real containers come back as PNG
            # (the reference server returns an encoded raster too)
            rendered = encode_rbmp(img) if is_rbmp(payload) else encode_png(img)
        except (ValueError, NotImplementedError):
            rendered = payload
    else:
        rendered = payload
    total = sum(float(x or 0.0) for x in elapses)
    return {
        "image": base64.b64encode(rendered).decode(),
        "total_elapse": f"{total:.4f}",
        "elapse_part": ",".join(f"{float(x or 0.0):.4f}" for x in elapses),
        "rec_res": json.dumps(rec_res, indent=2, ensure_ascii=False),
    }


def create_app(config=None, token: str | None = None):
    """Build the Flask app.  ``token`` enables the ocrweb_multi auth
    check on ``/api/ocr`` (main.py:43-45)."""
    try:
        from flask import Flask, request
    except ImportError as exc:  # pragma: no cover - env-gated
        raise ImportError(
            "serving requires flask; the batch engine "
            "(rapidocr_ray.pipelines) has no such dependency"
        ) from exc

    from rapidocr_ray.state.models import LANG_ROUTES

    app = Flask("rapidocr_ray")
    app.config["MAX_CONTENT_LENGTH"] = MAX_CONTENT_LENGTH
    ocr = RapidOCR(config)

    def json_response(data, status=200):
        return app.response_class(
            result_to_json(data), status=status, mimetype="application/json"
        )

    @app.route("/")
    def index():
        return json_response(
            {"msg": "rapidocr_ray serving shim", "routes": ["/ocr", "/lang", "/api/ocr"]}
        )

    @app.route("/ocr", methods=["POST"])
    def ocr_route():
        img_str = (request.get_json(silent=True) or {}).get("file")
        if img_str is None:
            return json_response({"msg": "img is None"}, status=400)
        payload = decode_data_url(img_str)
        return json_response(_web_return(ocr, payload, lang="en"))

    @app.route("/lang")
    def get_languages():
        data = [{"code": code, "name": code} for code in sorted(LANG_ROUTES)]
        return json_response({"msg": "OK", "data": data})

    @app.route("/api/ocr", methods=["POST", "GET"])
    def api_ocr():
        if token and request.values.get("token") != token:
            return json_response({"msg": "invalid token"}, status=403)
        lang = request.values.get("lang") or "ch"
        detect = parse_bool(request.values.get("detect") or "true")
        classify = parse_bool(request.values.get("classify") or "true")
        image_file = request.files.get("image")
        if not image_file:
            return json_response({"msg": "no image"}, status=400)
        payload = image_file.stream.read()
        t0 = time.perf_counter()
        result, _elapses = ocr(
            payload, lang=lang, use_det=detect, use_cls=classify
        )
        results = [
            {"box": box, "text": text, "score": score}
            for box, text, score in (result or [])
        ]
        data = {"ts": time.perf_counter() - t0, "results": results}
        return json_response({"msg": "OK", "data": data})

    return app


def main(argv=None):  # pragma: no cover - manual entry point
    """CLI entry (ocrweb.py:31-40): wsgiref server, -ip/-p flags."""
    import argparse
    from wsgiref.simple_server import make_server

    parser = argparse.ArgumentParser("rapidocr_ray.serving")
    parser.add_argument("-ip", "--ip", type=str, default="0.0.0.0")
    parser.add_argument("-p", "--port", type=int, default=9003)
    parser.add_argument("--token", type=str, default=None)
    args = parser.parse_args(argv)
    server = make_server(args.ip, args.port, create_app(token=args.token))
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
