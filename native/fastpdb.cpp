// fastpdb: native host data-plane accelerator.
//
// The reference's host chemistry layer runs on native code via RDKit and
// Biopython's C cores; this framework's pure-Python PDB/SDF frontend is the
// equivalent surface, and this translation unit provides its native tier:
//
//  - fastpdb_parse:   single-pass PDB ATOM/HETATM record parser -> flat
//                     arrays (first MODEL, altloc A/blank filter), the
//                     dataset-preprocessing hot spot at PDBBind scale
//  - fastsdf_parse:   SDF V2000 atom/bond/charge block parser
//  - pairwise_min_dist / count_within: distance primitives used by chain
//    filtering, pocket selection and steric-clash statistics
//
// Exposed through ctypes (no pybind11 in this image); see
// diffdock_pocket_tpu/data/native.py for the Python contract and fallback.
// Build: make -C native   (or the auto-build in native.py)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <cfloat>

extern "C" {

// Parse a float from a fixed-width PDB column (may contain spaces).
static inline float parse_field_f(const char* s, int start, int len, int linelen) {
    if (start >= linelen) return 0.0f;
    char buf[24];
    int n = linelen - start < len ? linelen - start : len;
    std::memcpy(buf, s + start, n);
    buf[n] = 0;
    return static_cast<float>(std::atof(buf));
}

static inline int parse_field_i(const char* s, int start, int len, int linelen) {
    if (start >= linelen) return 0;
    char buf[16];
    int n = linelen - start < len ? linelen - start : len;
    std::memcpy(buf, s + start, n);
    buf[n] = 0;
    return std::atoi(buf);
}

static inline void copy_trim(char* dst, const char* src, int start, int len, int linelen) {
    int b = start, e = start + len;
    if (b > linelen) b = linelen;
    if (e > linelen) e = linelen;
    while (b < e && src[b] == ' ') b++;
    while (e > b && src[e - 1] == ' ') e--;
    int n = e - b;
    if (n > len) n = len;
    std::memcpy(dst, src + b, n);
    for (int i = n; i < len; i++) dst[i] = 0;
}

// Parse PDB text.  Output arrays must hold max_atoms entries:
//   coords[3*i], name[4*i], element[2*i], chain[i], resname[3*i],
//   resseq[i], icode[i], het[i], occ[i], bfac[i], serial[i]
// Returns the number of atoms parsed (first MODEL only, altloc ' '/'A'/'1').
int fastpdb_parse(const char* text, int64_t text_len, int max_atoms,
                  float* coords, char* name, char* element, char* chain,
                  char* resname, int* resseq, char* icode, uint8_t* het,
                  float* occ, float* bfac, int* serial) {
    int n = 0;
    int64_t pos = 0;
    bool saw_endmdl = false;
    while (pos < text_len && n < max_atoms) {
        int64_t eol = pos;
        while (eol < text_len && text[eol] != '\n') eol++;
        int linelen = static_cast<int>(eol - pos);
        const char* line = text + pos;
        pos = eol + 1;
        if (linelen < 6) continue;
        if (std::memcmp(line, "ENDMDL", 6) == 0) { saw_endmdl = true; break; }
        bool is_atom = std::memcmp(line, "ATOM  ", 6) == 0;
        bool is_het = std::memcmp(line, "HETATM", 6) == 0;
        if (!is_atom && !is_het) continue;
        if (linelen < 54) continue;
        char alt = linelen > 16 ? line[16] : ' ';
        if (alt != ' ' && alt != 'A' && alt != '1') continue;

        copy_trim(name + 4 * n, line, 12, 4, linelen);
        copy_trim(resname + 3 * n, line, 17, 3, linelen);
        chain[n] = linelen > 21 ? line[21] : ' ';
        resseq[n] = parse_field_i(line, 22, 4, linelen);
        icode[n] = linelen > 26 ? (line[26] == ' ' ? 0 : line[26]) : 0;
        coords[3 * n + 0] = parse_field_f(line, 30, 8, linelen);
        coords[3 * n + 1] = parse_field_f(line, 38, 8, linelen);
        coords[3 * n + 2] = parse_field_f(line, 46, 8, linelen);
        occ[n] = linelen >= 60 ? parse_field_f(line, 54, 6, linelen) : 1.0f;
        bfac[n] = linelen >= 66 ? parse_field_f(line, 60, 6, linelen) : 0.0f;
        copy_trim(element + 2 * n, line, 76, 2, linelen);
        het[n] = is_het ? 1 : 0;
        serial[n] = parse_field_i(line, 6, 5, linelen);
        n++;
    }
    (void)saw_endmdl;
    return n;
}

// Parse an SDF (V2000) molecule block.  Returns n_atoms, or -1 on error.
// coords[3*i], symbol[4*i]; bonds[3*k] = (a, b, type) 0-based; charges[i].
int fastsdf_parse(const char* text, int64_t text_len, int max_atoms, int max_bonds,
                  float* coords, char* symbol, int* bonds, int* n_bonds_out,
                  int* charges) {
    // find the 4th line (counts line)
    int64_t pos = 0;
    for (int skip = 0; skip < 3; skip++) {
        while (pos < text_len && text[pos] != '\n') pos++;
        if (pos >= text_len) return -1;
        pos++;
    }
    int64_t eol = pos;
    while (eol < text_len && text[eol] != '\n') eol++;
    int linelen = static_cast<int>(eol - pos);
    const char* counts = text + pos;
    if (linelen < 6) return -1;
    int na = parse_field_i(counts, 0, 3, linelen);
    int nb = parse_field_i(counts, 3, 3, linelen);
    if (na <= 0 || na > max_atoms || nb < 0 || nb > max_bonds) return -1;
    pos = eol + 1;

    for (int i = 0; i < na; i++) {
        eol = pos;
        while (eol < text_len && text[eol] != '\n') eol++;
        linelen = static_cast<int>(eol - pos);
        const char* line = text + pos;
        if (linelen < 34) return -1;
        coords[3 * i + 0] = parse_field_f(line, 0, 10, linelen);
        coords[3 * i + 1] = parse_field_f(line, 10, 10, linelen);
        coords[3 * i + 2] = parse_field_f(line, 20, 10, linelen);
        copy_trim(symbol + 4 * i, line, 31, 3, linelen);
        symbol[4 * i + 3] = 0;
        // old-style charge code (col 36-39): 0 none, 1:+3 ... 7:-3
        int cc = linelen >= 39 ? parse_field_i(line, 36, 3, linelen) : 0;
        int q = 0;
        switch (cc) { case 1: q = 3; break; case 2: q = 2; break;
                      case 3: q = 1; break; case 5: q = -1; break;
                      case 6: q = -2; break; case 7: q = -3; break; }
        charges[i] = q;
        pos = eol + 1;
    }
    for (int k = 0; k < nb; k++) {
        eol = pos;
        while (eol < text_len && text[eol] != '\n') eol++;
        linelen = static_cast<int>(eol - pos);
        const char* line = text + pos;
        if (linelen < 9) return -1;
        bonds[3 * k + 0] = parse_field_i(line, 0, 3, linelen) - 1;
        bonds[3 * k + 1] = parse_field_i(line, 3, 3, linelen) - 1;
        bonds[3 * k + 2] = parse_field_i(line, 6, 3, linelen);
        pos = eol + 1;
    }
    // property block: M  CHG overrides
    while (pos < text_len) {
        eol = pos;
        while (eol < text_len && text[eol] != '\n') eol++;
        linelen = static_cast<int>(eol - pos);
        const char* line = text + pos;
        pos = eol + 1;
        if (linelen >= 6 && std::memcmp(line, "M  END", 6) == 0) break;
        if (linelen >= 6 && std::memcmp(line, "M  CHG", 6) == 0) {
            int cnt = parse_field_i(line, 6, 3, linelen);
            for (int j = 0; j < cnt; j++) {
                int idx = parse_field_i(line, 9 + 8 * j, 4, linelen) - 1;
                int q = parse_field_i(line, 13 + 8 * j, 4, linelen);
                if (idx >= 0 && idx < na) charges[idx] = q;
            }
        }
        if (linelen >= 4 && std::memcmp(line, "$$$$", 4) == 0) break;
    }
    *n_bonds_out = nb;
    return na;
}

// Minimum distance from each point in A to any point in B.
void pairwise_min_dist(const float* a, int na, const float* b, int nb,
                       float* out /* na */) {
    for (int i = 0; i < na; i++) {
        float best = FLT_MAX;
        const float ax = a[3 * i], ay = a[3 * i + 1], az = a[3 * i + 2];
        for (int j = 0; j < nb; j++) {
            const float dx = ax - b[3 * j];
            const float dy = ay - b[3 * j + 1];
            const float dz = az - b[3 * j + 2];
            const float d2 = dx * dx + dy * dy + dz * dz;
            if (d2 < best) best = d2;
        }
        out[i] = std::sqrt(best);
    }
}

// Count pairs (i, j) with |a_i - b_j| < r_i + r_j (vdW overlap test).
int count_within(const float* a, const float* ra, int na,
                 const float* b, const float* rb, int nb) {
    int count = 0;
    for (int i = 0; i < na; i++) {
        const float ax = a[3 * i], ay = a[3 * i + 1], az = a[3 * i + 2];
        for (int j = 0; j < nb; j++) {
            const float dx = ax - b[3 * j];
            const float dy = ay - b[3 * j + 1];
            const float dz = az - b[3 * j + 2];
            const float thr = ra[i] + rb[j];
            if (dx * dx + dy * dy + dz * dz < thr * thr) count++;
        }
    }
    return count;
}

}  // extern "C"
