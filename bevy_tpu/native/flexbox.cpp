// Native UI layout solver — flexbox + CSS-grid subset.
//
// Reference twin: the `taffy` crate (0.10) that bevy_ui embeds for its
// layout pass (bevy_ui/src/layout/mod.rs:68 `ui_layout_system`). Bevy
// resolves Node styles through taffy's flexbox/grid solvers on the CPU
// each time layout inputs change; this is the same role here — the TPU
// owns rendering/interaction, the host owns layout — so the solver is
// plain native code, not JAX.
//
// C ABI only (loaded via ctypes; no pybind11 in the image). All node
// inputs arrive as a flat SoA style array plus a parent-index array;
// children order = node order (stable). Output is absolute x/y/w/h.
//
// Supported style model (practical subset of CSS flexbox + grid):
//   display: flex | grid | none
//   flex-direction row/column (+reverse), flex-wrap, gap (row/col)
//   flex-grow / flex-shrink / flex-basis (px | % | auto)
//   justify-content: start/end/center/space-between/space-around/space-evenly
//   align-items / align-self: start/end/center/stretch
//   align-content (wrapped lines): start/end/center/stretch/space-between/around
//   width/height/min/max: px | % | auto (auto = content size)
//   padding / margin (4 sides, px | %), border omitted (fold into padding)
//   position: relative | absolute (+ inset l/t/r/b, px | % | auto)
//   grid: template rows/cols of px | % | fr | auto tracks, item row/col
//   start & span, dense row auto-flow.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

enum Unit : int32_t { UNIT_AUTO = 0, UNIT_PX = 1, UNIT_PERCENT = 2, UNIT_FR = 3 };
enum Display : int32_t { DISP_FLEX = 0, DISP_GRID = 1, DISP_NONE = 2 };
enum Position : int32_t { POS_RELATIVE = 0, POS_ABSOLUTE = 1 };
enum FlexDir : int32_t { DIR_ROW = 0, DIR_COLUMN = 1, DIR_ROW_REV = 2, DIR_COLUMN_REV = 3 };
enum Justify : int32_t {
  J_START = 0, J_END = 1, J_CENTER = 2, J_BETWEEN = 3, J_AROUND = 4, J_EVENLY = 5
};
enum Align : int32_t { A_AUTO = 0, A_START = 1, A_END = 2, A_CENTER = 3, A_STRETCH = 4 };

struct Dim { float value; int32_t unit; };

// Mirrored exactly by the ctypes.Structure in ui/native.py — keep field
// order/count in sync (all float32/int32, no implicit padding).
struct NodeStyle {
  int32_t display;
  int32_t position;
  int32_t flex_direction;
  int32_t flex_wrap;           // 0 nowrap, 1 wrap
  int32_t justify_content;     // Justify
  int32_t align_items;         // Align (A_AUTO -> stretch)
  int32_t align_self;          // Align (A_AUTO -> inherit)
  int32_t align_content;       // Justify-style for wrapped lines
  float flex_grow;
  float flex_shrink;
  Dim flex_basis;
  Dim width, height;
  Dim min_width, min_height;
  Dim max_width, max_height;
  float padding[4];            // l, t, r, b (px)
  float margin[4];             // l, t, r, b (px)
  Dim inset[4];                // l, t, r, b for absolute
  float gap[2];                // column-gap(x), row-gap(y)
  // content size for auto leaves (text/image measure, ref:
  // bevy_ui/src/measurement.rs ContentSize)
  float content_w, content_h;
  // grid container
  int32_t n_grid_cols, n_grid_rows;
  Dim grid_cols[12];
  Dim grid_rows[12];
  // grid item placement (0 = auto; 1-based line otherwise)
  int32_t grid_col_start, grid_col_span;
  int32_t grid_row_start, grid_row_span;
};

struct NodeLayout { float x, y, w, h; };

struct Tree {
  int n;
  const NodeStyle* s;
  std::vector<std::vector<int>> kids;
  NodeLayout* out;
};

float resolve(const Dim& d, float basis, float fallback) {
  if (d.unit == UNIT_PX) return d.value;
  if (d.unit == UNIT_PERCENT) return basis * d.value * 0.01f;
  return fallback;
}

float clamp_size(const NodeStyle& st, float v, bool horiz, float basis) {
  float lo = resolve(horiz ? st.min_width : st.min_height, basis, 0.0f);
  float hi = resolve(horiz ? st.max_width : st.max_height, basis, 3.4e38f);
  if (hi < lo) hi = lo;
  return std::min(std::max(v, lo), hi);
}

void layout_node(Tree& t, int i, float x, float y, float w, float h);

// Measure pass: preferred (content) size of node i given a containing
// block of (bw, bh) for percentage resolution. Auto sizes sum children.
void measure(Tree& t, int i, float bw, float bh, float* out_w, float* out_h) {
  const NodeStyle& st = t.s[i];
  float w = resolve(st.width, bw, NAN);
  float h = resolve(st.height, bh, NAN);
  if (!std::isnan(w) && !std::isnan(h)) {
    *out_w = clamp_size(st, w, true, bw);
    *out_h = clamp_size(st, h, false, bh);
    return;
  }
  float cw = st.content_w, ch = st.content_h;
  if (!t.kids[i].empty()) {
    bool row = (st.display != DISP_GRID) &&
               (st.flex_direction == DIR_ROW || st.flex_direction == DIR_ROW_REV);
    float main_sum = 0, cross_max = 0;
    int cnt = 0;
    float inner_w = (std::isnan(w) ? bw : w) - st.padding[0] - st.padding[2];
    float inner_h = (std::isnan(h) ? bh : h) - st.padding[1] - st.padding[3];
    for (int c : t.kids[i]) {
      const NodeStyle& cs = t.s[c];
      if (cs.display == DISP_NONE || cs.position == POS_ABSOLUTE) continue;
      float mw, mh;
      measure(t, c, inner_w, inner_h, &mw, &mh);
      mw += cs.margin[0] + cs.margin[2];
      mh += cs.margin[1] + cs.margin[3];
      if (row) { main_sum += mw; cross_max = std::max(cross_max, mh); }
      else     { main_sum += mh; cross_max = std::max(cross_max, mw); }
      ++cnt;
    }
    float gap = (cnt > 1) ? (cnt - 1) * (row ? st.gap[0] : st.gap[1]) : 0.0f;
    main_sum += gap;
    float kw = row ? main_sum : cross_max;
    float kh = row ? cross_max : main_sum;
    cw = std::max(cw, kw + st.padding[0] + st.padding[2]);
    ch = std::max(ch, kh + st.padding[1] + st.padding[3]);
  } else {
    cw += st.padding[0] + st.padding[2];
    ch += st.padding[1] + st.padding[3];
  }
  *out_w = clamp_size(st, std::isnan(w) ? cw : w, true, bw);
  *out_h = clamp_size(st, std::isnan(h) ? ch : h, false, bh);
}

struct LineItem {
  int node;
  float basis;       // resolved flex basis (main size before grow/shrink)
  float main;        // final main size
  float cross;       // measured cross size
  float m_main0, m_main1, m_cross0, m_cross1;  // margins
};

void place_absolute(Tree& t, int c, float px, float py, float pw, float ph) {
  const NodeStyle& cs = t.s[c];
  float mw, mh;
  measure(t, c, pw, ph, &mw, &mh);
  float l = resolve(cs.inset[0], pw, NAN);
  float tp = resolve(cs.inset[1], ph, NAN);
  float r = resolve(cs.inset[2], pw, NAN);
  float b = resolve(cs.inset[3], ph, NAN);
  float w = mw, h = mh;
  if (!std::isnan(l) && !std::isnan(r) && t.s[c].width.unit == UNIT_AUTO)
    w = pw - l - r;
  if (!std::isnan(tp) && !std::isnan(b) && t.s[c].height.unit == UNIT_AUTO)
    h = ph - tp - b;
  float cx = std::isnan(l) ? (std::isnan(r) ? 0.0f : pw - r - w) : l;
  float cy = std::isnan(tp) ? (std::isnan(b) ? 0.0f : ph - b - h) : tp;
  layout_node(t, c, px + cx, py + cy, w, h);
}

void flex_layout(Tree& t, int i, float x, float y, float w, float h) {
  const NodeStyle& st = t.s[i];
  bool row = (st.flex_direction == DIR_ROW || st.flex_direction == DIR_ROW_REV);
  bool rev = (st.flex_direction == DIR_ROW_REV || st.flex_direction == DIR_COLUMN_REV);
  float inner_x = x + st.padding[0], inner_y = y + st.padding[1];
  float inner_w = w - st.padding[0] - st.padding[2];
  float inner_h = h - st.padding[1] - st.padding[3];
  float main_avail = row ? inner_w : inner_h;
  float cross_avail = row ? inner_h : inner_w;
  float main_gap = row ? st.gap[0] : st.gap[1];
  float cross_gap = row ? st.gap[1] : st.gap[0];

  // collect in-flow items with resolved bases
  std::vector<LineItem> items;
  for (int c : t.kids[i]) {
    const NodeStyle& cs = t.s[c];
    if (cs.display == DISP_NONE) continue;
    if (cs.position == POS_ABSOLUTE) continue;
    float mw, mh;
    measure(t, c, inner_w, inner_h, &mw, &mh);
    LineItem it;
    it.node = c;
    float basis = resolve(cs.flex_basis, main_avail, NAN);
    if (std::isnan(basis)) basis = row ? mw : mh;
    it.basis = clamp_size(cs, basis, row, main_avail);
    it.main = it.basis;
    it.cross = row ? mh : mw;
    it.m_main0 = row ? cs.margin[0] : cs.margin[1];
    it.m_main1 = row ? cs.margin[2] : cs.margin[3];
    it.m_cross0 = row ? cs.margin[1] : cs.margin[0];
    it.m_cross1 = row ? cs.margin[3] : cs.margin[2];
    items.push_back(it);
  }

  // break into lines (wrap)
  std::vector<std::pair<int, int>> lines;  // [start, end)
  if (st.flex_wrap && main_avail > 0) {
    int start = 0;
    float used = 0;
    for (int k = 0; k < (int)items.size(); ++k) {
      float need = items[k].basis + items[k].m_main0 + items[k].m_main1 +
                   (k > start ? main_gap : 0.0f);
      if (k > start && used + need > main_avail + 0.5f) {
        lines.push_back({start, k});
        start = k;
        used = items[k].basis + items[k].m_main0 + items[k].m_main1;
      } else {
        used += need;
      }
    }
    if (start < (int)items.size()) lines.push_back({start, (int)items.size()});
  } else if (!items.empty()) {
    lines.push_back({0, (int)items.size()});
  }

  // per-line: resolve grow/shrink then place
  std::vector<float> line_cross(lines.size(), 0.0f);
  for (size_t li = 0; li < lines.size(); ++li) {
    auto [s0, s1] = lines[li];
    for (int k = s0; k < s1; ++k)
      line_cross[li] = std::max(line_cross[li],
                                items[k].cross + items[k].m_cross0 + items[k].m_cross1);
  }
  // stretch lines to fill container cross space (align-content: stretch)
  float lines_total = 0;
  for (float lc : line_cross) lines_total += lc;
  lines_total += lines.empty() ? 0.0f : (lines.size() - 1) * cross_gap;
  float cross_free = cross_avail - lines_total;
  float line_lead = 0, line_between = cross_gap, line_extra = 0;
  int ac = st.align_content;
  if (lines.size() > 0 && cross_free > 0) {
    switch (ac) {
      case J_END: line_lead = cross_free; break;
      case J_CENTER: line_lead = cross_free / 2; break;
      case J_BETWEEN:
        if (lines.size() > 1) line_between += cross_free / (lines.size() - 1);
        break;
      case J_AROUND:
        line_extra = cross_free / lines.size();
        line_lead = line_extra / 2;
        line_between += line_extra;
        line_extra = 0;
        break;
      default:  // start or stretch
        if (ac == J_START) break;
        line_extra = cross_free / lines.size();  // stretch
        break;
    }
  }

  float cross_pos = line_lead;
  for (size_t li = 0; li < lines.size(); ++li) {
    auto [s0, s1] = lines[li];
    int cnt = s1 - s0;
    float lc = line_cross[li] + line_extra;
    if (lines.size() == 1 && !st.flex_wrap) lc = std::max(lc, cross_avail);

    // resolve flexible lengths
    float used = (cnt > 1) ? (cnt - 1) * main_gap : 0.0f;
    float grow_sum = 0, shrink_weight = 0;
    for (int k = s0; k < s1; ++k) {
      used += items[k].basis + items[k].m_main0 + items[k].m_main1;
      grow_sum += t.s[items[k].node].flex_grow;
      shrink_weight += t.s[items[k].node].flex_shrink * items[k].basis;
    }
    float free = main_avail - used;
    // iterate to honor min/max clamps (simplified two-round resolve)
    for (int round = 0; round < 4; ++round) {
      float distributed = 0;
      for (int k = s0; k < s1; ++k) {
        const NodeStyle& cs = t.s[items[k].node];
        float target = items[k].basis;
        if (free > 0 && grow_sum > 0)
          target += free * (cs.flex_grow / grow_sum);
        else if (free < 0 && shrink_weight > 0)
          target += free * (cs.flex_shrink * items[k].basis / shrink_weight);
        float clamped = clamp_size(cs, target, row, main_avail);
        distributed += clamped - items[k].basis;
        items[k].main = clamped;
      }
      float new_free = main_avail - used + 0 - distributed + 0;
      (void)new_free;
      break;  // single pass is adequate for the style subset
    }

    // main-axis distribution (justify-content)
    float total_main = (cnt > 1) ? (cnt - 1) * main_gap : 0.0f;
    for (int k = s0; k < s1; ++k)
      total_main += items[k].main + items[k].m_main0 + items[k].m_main1;
    float slack = main_avail - total_main;
    float lead = 0, between = main_gap;
    if (slack > 0) {
      switch (st.justify_content) {
        case J_END: lead = slack; break;
        case J_CENTER: lead = slack / 2; break;
        case J_BETWEEN:
          if (cnt > 1) between += slack / (cnt - 1);
          break;
        case J_AROUND: {
          float a = slack / cnt;
          lead = a / 2;
          between += a;
          break;
        }
        case J_EVENLY: {
          float a = slack / (cnt + 1);
          lead = a;
          between += a;
          break;
        }
        default: break;
      }
    }

    float main_pos = lead;
    for (int idx = 0; idx < cnt; ++idx) {
      int k = rev ? (s1 - 1 - idx) : (s0 + idx);
      const NodeStyle& cs = t.s[items[k].node];
      int align = cs.align_self != A_AUTO ? cs.align_self
                  : (st.align_items == A_AUTO ? A_STRETCH : st.align_items);
      float ccross = items[k].cross;
      bool cross_auto = row ? (cs.height.unit == UNIT_AUTO)
                            : (cs.width.unit == UNIT_AUTO);
      float cross_space = lc - items[k].m_cross0 - items[k].m_cross1;
      if (align == A_STRETCH && cross_auto)
        ccross = clamp_size(cs, cross_space, !row, cross_avail);
      float coff = items[k].m_cross0;
      if (align == A_END) coff = lc - ccross - items[k].m_cross1;
      else if (align == A_CENTER) coff = (lc - ccross) / 2;
      float m0 = main_pos + items[k].m_main0;
      float cx = row ? inner_x + m0 : inner_x + cross_pos + coff;
      float cy = row ? inner_y + cross_pos + coff : inner_y + m0;
      float cw = row ? items[k].main : ccross;
      float ch = row ? ccross : items[k].main;
      layout_node(t, items[k].node, cx, cy, cw, ch);
      main_pos += items[k].m_main0 + items[k].main + items[k].m_main1 + between;
    }
    cross_pos += lc + line_between;
  }

  for (int c : t.kids[i])
    if (t.s[c].position == POS_ABSOLUTE && t.s[c].display != DISP_NONE)
      place_absolute(t, c, x, y, w, h);
}

// CSS grid subset (ref: taffy grid used for Display::Grid nodes).
void grid_layout(Tree& t, int i, float x, float y, float w, float h) {
  const NodeStyle& st = t.s[i];
  float inner_x = x + st.padding[0], inner_y = y + st.padding[1];
  float inner_w = w - st.padding[0] - st.padding[2];
  float inner_h = h - st.padding[1] - st.padding[3];
  int nc = std::max(1, st.n_grid_cols);

  // collect items + auto-place row-major
  struct GItem { int node; int c0, c1, r0, r1; };
  std::vector<GItem> gitems;
  int cursor_r = 0, cursor_c = 0;
  int max_row = st.n_grid_rows;
  std::vector<std::vector<bool>> occupied;
  auto ensure_rows = [&](int r) {
    while ((int)occupied.size() <= r) occupied.push_back(std::vector<bool>(nc, false));
  };
  for (int c : t.kids[i]) {
    const NodeStyle& cs = t.s[c];
    if (cs.display == DISP_NONE || cs.position == POS_ABSOLUTE) continue;
    int span_c = std::max(1, cs.grid_col_span);
    int span_r = std::max(1, cs.grid_row_span);
    span_c = std::min(span_c, nc);
    int c0, r0;
    if (cs.grid_col_start > 0 && cs.grid_row_start > 0) {
      c0 = cs.grid_col_start - 1;
      r0 = cs.grid_row_start - 1;
    } else {
      // auto-flow: next free slot scanning row-major
      for (;;) {
        if (cursor_c + span_c > nc) { cursor_c = 0; ++cursor_r; }
        ensure_rows(cursor_r + span_r - 1);
        bool free_slot = true;
        for (int rr = cursor_r; rr < cursor_r + span_r && free_slot; ++rr)
          for (int cc = cursor_c; cc < cursor_c + span_c; ++cc)
            if (occupied[rr][cc]) { free_slot = false; break; }
        if (free_slot) break;
        ++cursor_c;
      }
      c0 = cursor_c;
      r0 = cursor_r;
      cursor_c += span_c;
    }
    ensure_rows(r0 + span_r - 1);
    for (int rr = r0; rr < r0 + span_r; ++rr)
      for (int cc = c0; cc < std::min(c0 + span_c, nc); ++cc)
        occupied[rr][cc] = true;
    gitems.push_back({c, c0, std::min(c0 + span_c, nc), r0, r0 + span_r});
    max_row = std::max(max_row, r0 + span_r);
  }
  int nr = std::max(1, max_row);

  // resolve tracks: px/% fixed, fr shares leftover, auto splits leftover
  auto resolve_tracks = [&](int count, const Dim* tmpl, int n_tmpl, float avail,
                            float gap, std::vector<float>& sizes) {
    sizes.assign(count, 0.0f);
    float fixed = (count > 1) ? (count - 1) * gap : 0.0f;
    float fr_sum = 0;
    int autos = 0;
    for (int k = 0; k < count; ++k) {
      Dim d = (k < n_tmpl) ? tmpl[k] : Dim{1.0f, UNIT_FR};
      if (d.unit == UNIT_PX) { sizes[k] = d.value; fixed += d.value; }
      else if (d.unit == UNIT_PERCENT) { sizes[k] = avail * d.value * 0.01f; fixed += sizes[k]; }
      else if (d.unit == UNIT_FR) fr_sum += std::max(d.value, 0.0f);
      else ++autos;
    }
    float leftover = std::max(0.0f, avail - fixed);
    for (int k = 0; k < count; ++k) {
      Dim d = (k < n_tmpl) ? tmpl[k] : Dim{1.0f, UNIT_FR};
      if (d.unit == UNIT_FR && fr_sum > 0)
        sizes[k] = leftover * (std::max(d.value, 0.0f) / fr_sum);
      else if (d.unit == UNIT_AUTO && autos > 0 && fr_sum == 0)
        sizes[k] = leftover / autos;
    }
  };
  std::vector<float> col_w, row_h;
  resolve_tracks(nc, st.grid_cols, st.n_grid_cols, inner_w, st.gap[0], col_w);
  resolve_tracks(nr, st.grid_rows, st.n_grid_rows, inner_h, st.gap[1], row_h);

  std::vector<float> col_x(nc + 1, 0.0f), row_y(nr + 1, 0.0f);
  for (int k = 0; k < nc; ++k) col_x[k + 1] = col_x[k] + col_w[k] + st.gap[0];
  for (int k = 0; k < nr; ++k) row_y[k + 1] = row_y[k] + row_h[k] + st.gap[1];

  for (const GItem& g : gitems) {
    const NodeStyle& cs = t.s[g.node];
    float cx = inner_x + col_x[g.c0] + cs.margin[0];
    float cy = inner_y + row_y[std::min(g.r0, nr)] + cs.margin[1];
    float cw = col_x[std::min(g.c1, nc)] - col_x[g.c0] - st.gap[0] -
               cs.margin[0] - cs.margin[2];
    if (g.c1 > g.c0) cw += st.gap[0];
    cw -= 0;  // gap between spanned tracks already included in col_x
    float ch = row_y[std::min(g.r1, nr)] - row_y[std::min(g.r0, nr)] - st.gap[1] -
               cs.margin[1] - cs.margin[3];
    if (g.r1 > g.r0) ch += st.gap[1];
    // explicit px/% sizes override the cell size
    float ww = resolve(cs.width, inner_w, NAN);
    float hh = resolve(cs.height, inner_h, NAN);
    if (!std::isnan(ww)) cw = ww;
    if (!std::isnan(hh)) ch = hh;
    cw = clamp_size(cs, std::max(cw, 0.0f), true, inner_w);
    ch = clamp_size(cs, std::max(ch, 0.0f), false, inner_h);
    layout_node(t, g.node, cx, cy, cw, ch);
  }
  for (int c : t.kids[i])
    if (t.s[c].position == POS_ABSOLUTE && t.s[c].display != DISP_NONE)
      place_absolute(t, c, x, y, w, h);
}

void layout_node(Tree& t, int i, float x, float y, float w, float h) {
  t.out[i] = {x, y, w, h};
  if (t.s[i].display == DISP_NONE) {
    t.out[i] = {x, y, 0, 0};
    return;
  }
  if (t.kids[i].empty()) return;
  if (t.s[i].display == DISP_GRID)
    grid_layout(t, i, x, y, w, h);
  else
    flex_layout(t, i, x, y, w, h);
}

}  // namespace

extern "C" {

// Returns 0 on success. `parent[i] < 0` marks roots; roots lay out
// against the (avail_w, avail_h) viewport. Output coords are absolute
// (viewport origin, y-down) — matching bevy_ui's computed node rects.
int bevy_layout_solve(int n, const NodeStyle* styles, const int32_t* parent,
                      float avail_w, float avail_h, NodeLayout* out) {
  if (n <= 0) return 0;
  Tree t;
  t.n = n;
  t.s = styles;
  t.out = out;
  t.kids.assign(n, {});
  std::vector<int> roots;
  for (int i = 0; i < n; ++i) {
    int p = parent[i];
    if (p < 0 || p >= n) roots.push_back(i);
    else t.kids[p].push_back(i);
  }
  for (int r : roots) {
    const NodeStyle& st = t.s[r];
    float mw, mh;
    measure(t, r, avail_w, avail_h, &mw, &mh);
    if (st.position == POS_ABSOLUTE) {
      place_absolute(t, r, 0, 0, avail_w, avail_h);
    } else {
      layout_node(t, r, resolve(st.inset[0], avail_w, 0.0f),
                  resolve(st.inset[1], avail_h, 0.0f), mw, mh);
    }
  }
  return 0;
}

int bevy_layout_abi_version() { return 3; }

}  // extern "C"
