"""Interactive 3D scene export to a self-contained HTML file.

Parity with the reference's plotly html output
(/root/reference/arcnerf/visual/plot_3d.py:385-561 draws cameras, rays,
points, volumes and meshes to an interactive html page). Plotly is not in
this environment, so the page embeds its own ~200-line WebGL orbit viewer:
no external assets, opens in any browser. Components are grouped and can
be toggled from a legend, matching plotly's per-trace toggling.

Scene groups: {"name", "type": points|lines|mesh, "positions": flat xyz,
"colors": flat rgb in [0,1] (per vertex), "faces": flat index triples
(mesh only)}.
"""

import json

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body { margin: 0; background: #111; color: #ddd; font: 13px sans-serif; }
 #legend { position: absolute; top: 8px; left: 8px; background: rgba(0,0,0,.6);
           padding: 8px 10px; border-radius: 6px; }
 #legend label { display: block; cursor: pointer; }
 #hint { position: absolute; bottom: 8px; left: 8px; opacity: .5; }
 canvas { display: block; width: 100vw; height: 100vh; }
</style></head>
<body>
<canvas id="c"></canvas>
<div id="legend"><b>__TITLE__</b></div>
<div id="hint">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan</div>
<script>
const SCENE = __SCENE_JSON__;

const canvas = document.getElementById('c');
const gl = canvas.getContext('webgl', {antialias: true});
const VS = `
attribute vec3 pos; attribute vec3 col; uniform mat4 mvp; uniform float psize;
varying vec3 vcol;
void main() { gl_Position = mvp * vec4(pos, 1.0); gl_PointSize = psize; vcol = col; }`;
const FS = `
precision mediump float; varying vec3 vcol; uniform float alpha;
void main() { gl_FragColor = vec4(vcol, alpha); }`;

function shader(type, src) {
  const s = gl.createShader(type); gl.shaderSource(s, src); gl.compileShader(s);
  if (!gl.getShaderParameter(s, gl.COMPILE_STATUS)) throw gl.getShaderInfoLog(s);
  return s;
}
const prog = gl.createProgram();
gl.attachShader(prog, shader(gl.VERTEX_SHADER, VS));
gl.attachShader(prog, shader(gl.FRAGMENT_SHADER, FS));
gl.linkProgram(prog); gl.useProgram(prog);
const locPos = gl.getAttribLocation(prog, 'pos');
const locCol = gl.getAttribLocation(prog, 'col');
const locMvp = gl.getUniformLocation(prog, 'mvp');
const locPsize = gl.getUniformLocation(prog, 'psize');
const locAlpha = gl.getUniformLocation(prog, 'alpha');

// build GL buffers per group
let center = [0, 0, 0], radius = 1;
{
  let lo = [1e9, 1e9, 1e9], hi = [-1e9, -1e9, -1e9];
  for (const g of SCENE.groups) {
    const p = g.positions;
    for (let i = 0; i < p.length; i += 3)
      for (let d = 0; d < 3; d++) {
        if (p[i + d] < lo[d]) lo[d] = p[i + d];
        if (p[i + d] > hi[d]) hi[d] = p[i + d];
      }
  }
  for (let d = 0; d < 3; d++) center[d] = (lo[d] + hi[d]) / 2;
  radius = Math.max(hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2], 1e-3) * 0.9;
}
const groups = SCENE.groups.map(g => {
  const vb = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, vb);
  gl.bufferData(gl.ARRAY_BUFFER, new Float32Array(g.positions), gl.STATIC_DRAW);
  const cb = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, cb);
  gl.bufferData(gl.ARRAY_BUFFER, new Float32Array(g.colors), gl.STATIC_DRAW);
  let ib = null, nidx = 0;
  if (g.type === 'mesh') {
    ib = gl.createBuffer();
    gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, ib);
    gl.bufferData(gl.ELEMENT_ARRAY_BUFFER, new Uint32Array(g.faces), gl.STATIC_DRAW);
    nidx = g.faces.length;
  }
  return {g, vb, cb, ib, nidx, n: g.positions.length / 3, visible: true};
});
gl.getExtension('OES_element_index_uint');

// legend with toggles
const legend = document.getElementById('legend');
for (const e of groups) {
  const lab = document.createElement('label');
  const cb = document.createElement('input');
  cb.type = 'checkbox'; cb.checked = true;
  cb.onchange = () => { e.visible = cb.checked; draw(); };
  lab.appendChild(cb);
  const c = e.g.colors;
  const sw = document.createElement('span');
  sw.textContent = ' ■ ';
  sw.style.color = `rgb(${c[0]*255|0},${c[1]*255|0},${c[2]*255|0})`;
  lab.appendChild(sw);
  lab.appendChild(document.createTextNode(e.g.name));
  legend.appendChild(lab);
}

// orbit camera
let theta = 0.8, phi = 1.0, dist = radius * 2.2, pan = [0, 0, 0];
function mat(out) { return out; }
function mvp() {
  const cx = center[0] + pan[0], cy = center[1] + pan[1], cz = center[2] + pan[2];
  const eye = [cx + dist * Math.sin(phi) * Math.cos(theta),
               cy + dist * Math.cos(phi),
               cz + dist * Math.sin(phi) * Math.sin(theta)];
  // look-at
  let f = [cx - eye[0], cy - eye[1], cz - eye[2]];
  const fl = Math.hypot(...f); f = f.map(v => v / fl);
  let up = [0, 1, 0];
  let s = [f[1]*up[2]-f[2]*up[1], f[2]*up[0]-f[0]*up[2], f[0]*up[1]-f[1]*up[0]];
  const sl = Math.hypot(...s) || 1; s = s.map(v => v / sl);
  const u = [s[1]*f[2]-s[2]*f[1], s[2]*f[0]-s[0]*f[2], s[0]*f[1]-s[1]*f[0]];
  const view = [
    s[0], u[0], -f[0], 0,
    s[1], u[1], -f[1], 0,
    s[2], u[2], -f[2], 0,
    -(s[0]*eye[0]+s[1]*eye[1]+s[2]*eye[2]),
    -(u[0]*eye[0]+u[1]*eye[1]+u[2]*eye[2]),
    (f[0]*eye[0]+f[1]*eye[1]+f[2]*eye[2]), 1];
  const aspect = canvas.width / canvas.height;
  const fy = 1 / Math.tan(0.4), near = dist * 0.01, far = dist * 50;
  const proj = [
    fy / aspect, 0, 0, 0,
    0, fy, 0, 0,
    0, 0, (far + near) / (near - far), -1,
    0, 0, 2 * far * near / (near - far), 0];
  // proj * view (column major)
  const m = new Float32Array(16);
  for (let c0 = 0; c0 < 4; c0++)
    for (let r = 0; r < 4; r++) {
      let acc = 0;
      for (let k = 0; k < 4; k++) acc += proj[k * 4 + r] * view[c0 * 4 + k];
      m[c0 * 4 + r] = acc;
    }
  return m;
}

function draw() {
  canvas.width = canvas.clientWidth * devicePixelRatio;
  canvas.height = canvas.clientHeight * devicePixelRatio;
  gl.viewport(0, 0, canvas.width, canvas.height);
  gl.clearColor(0.07, 0.07, 0.08, 1);
  gl.enable(gl.DEPTH_TEST);
  gl.enable(gl.BLEND);
  gl.blendFunc(gl.SRC_ALPHA, gl.ONE_MINUS_SRC_ALPHA);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  gl.uniformMatrix4fv(locMvp, false, mvp());
  for (const e of groups) {
    if (!e.visible) continue;
    gl.bindBuffer(gl.ARRAY_BUFFER, e.vb);
    gl.enableVertexAttribArray(locPos);
    gl.vertexAttribPointer(locPos, 3, gl.FLOAT, false, 0, 0);
    gl.bindBuffer(gl.ARRAY_BUFFER, e.cb);
    gl.enableVertexAttribArray(locCol);
    gl.vertexAttribPointer(locCol, 3, gl.FLOAT, false, 0, 0);
    if (e.g.type === 'points') {
      gl.uniform1f(locPsize, e.g.point_size || 3);
      gl.uniform1f(locAlpha, 1.0);
      gl.drawArrays(gl.POINTS, 0, e.n);
    } else if (e.g.type === 'lines') {
      gl.uniform1f(locAlpha, 0.9);
      gl.drawArrays(gl.LINES, 0, e.n);
    } else {
      gl.uniform1f(locAlpha, e.g.alpha || 0.65);
      gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, e.ib);
      gl.drawElements(gl.TRIANGLES, e.nidx, gl.UNSIGNED_INT, 0);
    }
  }
}

let dragging = false, panning = false, lx = 0, ly = 0;
canvas.onmousedown = e => { dragging = true; panning = e.shiftKey; lx = e.clientX; ly = e.clientY; };
window.onmouseup = () => dragging = false;
window.onmousemove = e => {
  if (!dragging) return;
  const dx = e.clientX - lx, dy = e.clientY - ly;
  lx = e.clientX; ly = e.clientY;
  if (panning) {
    pan[0] -= dx * dist * 0.001 * Math.sin(theta);
    pan[2] += dx * dist * 0.001 * Math.cos(theta);
    pan[1] += dy * dist * 0.001;
  } else {
    theta += dx * 0.008;
    phi = Math.min(Math.PI - 0.05, Math.max(0.05, phi - dy * 0.008));
  }
  draw();
};
canvas.onwheel = e => { e.preventDefault(); dist *= Math.exp(e.deltaY * 0.001); draw(); };
window.onresize = draw;
draw();
</script></body></html>
"""


def _flat(a):
    return [round(float(x), 5) for x in np.asarray(a, dtype=np.float64).reshape(-1)]


def _expand_colors(colors, n, default):
    if colors is None:
        colors = default
    colors = np.asarray(colors, dtype=np.float64)
    if colors.ndim == 1:
        colors = np.tile(colors[None], (n, 1))
    if colors.shape[0] == 1 and n > 1:
        colors = np.tile(colors, (n, 1))
    return colors


class HtmlScene:
    """Accumulates scene groups; write() emits the standalone html."""

    def __init__(self, title="scene"):
        self.title = title
        self.groups = []

    def add_points(self, name, pts, colors=None, point_size=3.0):
        pts = np.asarray(pts).reshape(-1, 3)
        colors = _expand_colors(colors, pts.shape[0], (0.2, 0.8, 0.4))
        self.groups.append({
            "name": name, "type": "points", "positions": _flat(pts),
            "colors": _flat(colors), "point_size": float(point_size),
        })

    def add_lines(self, name, segments, colors=None):
        """segments: (S, 2, 3) array or list of (K, 3) polylines."""
        segs = []
        if isinstance(segments, np.ndarray) and segments.ndim == 3 and segments.shape[1] == 2:
            segs = segments.reshape(-1, 3)
        else:
            parts = []
            for poly in segments:
                poly = np.asarray(poly).reshape(-1, 3)
                for i in range(poly.shape[0] - 1):
                    parts.append(poly[i])
                    parts.append(poly[i + 1])
            segs = np.asarray(parts).reshape(-1, 3) if parts else np.zeros((0, 3))
        colors = _expand_colors(colors, segs.shape[0], (0.55, 0.6, 0.9))
        self.groups.append({
            "name": name, "type": "lines", "positions": _flat(segs), "colors": _flat(colors),
        })

    def add_mesh(self, name, verts, faces, colors=None, alpha=0.65):
        verts = np.asarray(verts).reshape(-1, 3)
        faces = np.asarray(faces).reshape(-1, 3)
        if colors is None:
            # simple lambertian shading baked into vertex colors
            from ..geometry.mesh import get_normals

            vert_n, _ = get_normals(verts, faces)
            lam = 0.4 + 0.6 * np.clip(vert_n @ np.array([0.4, 0.8, 0.45]), 0, 1)
            colors = np.stack([0.8 * lam, 0.7 * lam, 0.55 * lam], axis=-1)
        colors = _expand_colors(colors, verts.shape[0], (0.7, 0.7, 0.6))
        self.groups.append({
            "name": name, "type": "mesh", "positions": _flat(verts),
            "colors": _flat(colors), "faces": [int(i) for i in faces.reshape(-1)],
            "alpha": float(alpha),
        })

    def write(self, path):
        page = _PAGE.replace("__TITLE__", self.title).replace(
            "__SCENE_JSON__", json.dumps({"groups": self.groups}))
        with open(path, "w") as f:
            f.write(page)
        return path
