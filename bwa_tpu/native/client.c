/* bwa-tpu: native CLI front-end.
 *
 * The Python interpreter on this image pays ~2.3 s of TPU-plugin
 * registration per process (sitecustomize), which dwarfs the actual
 * work of warm one-shot commands.  This client keeps one-shots native:
 *
 *   1. If a resident-engine daemon (bwa_tpu/server.py) is running for
 *      the command's index prefix, forward the command over its unix
 *      socket and stream the reply — no Python at all (~ms overhead).
 *   2. Otherwise exec the Python CLI.  Host-only subcommands (aln,
 *      samse, sampe, bwasw, index, ... — everything that never touches
 *      the device) get PALLAS_AXON_POOL_IPS stripped so the interpreter
 *      skips the TPU registration and starts in ~0.3 s.
 *
 * Socket naming matches server.py: FNV-1a 64 of realpath(prefix).
 * Forward guard: every existing-file argument is rewritten to its
 * realpath (the daemon's cwd differs); "-"/non-regular-file inputs and
 * -o/-f outputs fall back to the Python path, which handles them.
 */

#include <dlfcn.h>
#include <errno.h>
#include <libgen.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <sys/un.h>
#include <unistd.h>
#include <limits.h>

static uint64_t fnv1a64(const char *s) {
  uint64_t h = 0xCBF29CE484222325ull;
  for (; *s; ++s) {
    h ^= (uint8_t)*s;
    h *= 0x100000001B3ull;
  }
  return h;
}

/* subcommands that can run on the daemon's warm state: mem/fastmap use
 * the warm device programs; aln/samse/sampe use the warm index + warm
 * interpreter (binary-safe framing streams .sai byte-exactly) */
static const char *FWD_CMDS[] = {"mem", "fastmap", "aln", "samse", "sampe",
                                 NULL};
/* subcommands that never touch the device: strip the TPU plugin env so
 * the Python fallback starts fast */
static const char *HOST_CMDS[] = {"aln",     "samse",     "sampe",
                                  "bwasw",   "index",     "pemerge",
                                  "maxk",    "xa2multi",  "qualfa2fq",
                                  "fa2pac",  "pac2bwt",   "bwtupdate",
                                  "bwt2sa",  NULL};

static int in_list(const char *cmd, const char **list) {
  for (int i = 0; list[i]; ++i)
    if (strcmp(cmd, list[i]) == 0) return 1;
  return 0;
}

/* backtrack one-shots run fully native (btcli.cpp bt_cli_main in the
 * shared lib, symlinked next to this executable by native/build.py):
 * index load + strict FASTQ + search + finalize with zero Python.  A
 * return of 100 means "unsupported shape, nothing written": fall
 * through to the Python CLI. */
static const char *NATIVE_CMDS[] = {"aln", "samse", "sampe", "fastmap",
                                    NULL};

static void try_native(int argc, char **argv) {
  if (argc < 2 || !in_list(argv[1], NATIVE_CMDS)) return;
  if (getenv("BWA_TPU_NO_NATIVE_CLI")) return;
  char exe[PATH_MAX];
  ssize_t n = readlink("/proc/self/exe", exe, sizeof exe - 1);
  if (n <= 0) return;
  exe[n] = 0;
  char sopath[PATH_MAX + 32];
  snprintf(sopath, sizeof sopath, "%s/bwa_tpu_native.so", dirname(exe));
  void *h = dlopen(sopath, RTLD_NOW | RTLD_LOCAL);
  if (!h) return;
  int (*entry)(int, char **) = (int (*)(int, char **))
      dlsym(h, "bt_cli_main");
  if (!entry) return;
  int rc = entry(argc, argv);
  if (rc != 100) exit(rc); /* handled (0/1); 100 = fall back to Python */
}

static void exec_python(int argc, char **argv, int strip_axon) {
  try_native(argc, argv);
  if (strip_axon) unsetenv("PALLAS_AXON_POOL_IPS");
  char **pargv = malloc(sizeof(char *) * (argc + 4));
  int n = 0;
  const char *py = getenv("BWA_TPU_PYTHON");
  pargv[n++] = (char *)(py ? py : "python3");
  pargv[n++] = "-m";
  pargv[n++] = "bwa_tpu.cli";
  for (int i = 1; i < argc; ++i) pargv[n++] = argv[i];
  pargv[n] = NULL;
  execvp(pargv[0], pargv);
  perror("bwa-tpu: exec python");
  exit(127);
}

/* JSON-escape into out (caller sized 6*len+3); returns out */
static char *jstr(const char *s, char *out) {
  char *o = out;
  *o++ = '"';
  for (; *s; ++s) {
    unsigned char c = (unsigned char)*s;
    if (c == '"' || c == '\\') {
      *o++ = '\\';
      *o++ = c;
    } else if (c < 0x20) {
      o += sprintf(o, "\\u%04x", c);
    } else {
      *o++ = c;
    }
  }
  *o++ = '"';
  *o = 0;
  return out;
}

int main(int argc, char **argv) {
  if (argc < 2) exec_python(argc, argv, 0);
  const char *cmd = argv[1];
  int host_only = in_list(cmd, HOST_CMDS);
  if (!in_list(cmd, FWD_CMDS)) exec_python(argc, argv, host_only);

  /* locate the index prefix: first argument with <arg>.bwt on disk */
  char prefix_real[PATH_MAX];
  int have_prefix = 0;
  char **fwd = malloc(sizeof(char *) * argc); /* rewritten argv[1..] */
  int nfwd = 0;
  fwd[nfwd++] = (char *)cmd;
  for (int i = 2; i < argc; ++i) {
    const char *a = argv[i];
    if (strcmp(a, "-") == 0) exec_python(argc, argv, host_only);
    if (strcmp(a, "-o") == 0 || strcmp(a, "-f") == 0)
      exec_python(argc, argv, host_only); /* local output file */
    struct stat st;
    if (stat(a, &st) == 0) {
      if (!S_ISREG(st.st_mode) && !S_ISDIR(st.st_mode))
        exec_python(argc, argv, host_only); /* pipes / process subst */
      if (S_ISREG(st.st_mode)) {
        char *rp = realpath(a, NULL);
        if (rp) {
          fwd[nfwd++] = rp;
          if (!have_prefix) {
            char probe[PATH_MAX + 8];
            snprintf(probe, sizeof probe, "%s.bwt", rp);
            struct stat st2;
            if (stat(probe, &st2) == 0) {
              strncpy(prefix_real, rp, sizeof prefix_real - 1);
              prefix_real[sizeof prefix_real - 1] = 0;
              have_prefix = 1;
            }
          }
          continue;
        }
      }
    }
    fwd[nfwd++] = (char *)a;
  }
  if (!have_prefix) exec_python(argc, argv, host_only);

  /* socket path */
  const char *dir = getenv("BWA_TPU_DAEMON_DIR");
  if (!dir) dir = "/tmp/bwa_tpu_daemon";
  char spath[PATH_MAX];
  snprintf(spath, sizeof spath, "%s/engine-%016llx.sock", dir,
           (unsigned long long)fnv1a64(prefix_real));

  int fd = socket(AF_UNIX, SOCK_STREAM, 0);
  struct sockaddr_un sa;
  memset(&sa, 0, sizeof sa);
  sa.sun_family = AF_UNIX;
  strncpy(sa.sun_path, spath, sizeof sa.sun_path - 1);
  if (fd < 0 || connect(fd, (struct sockaddr *)&sa, sizeof sa) != 0) {
    if (fd >= 0) close(fd);
    exec_python(argc, argv, host_only);
  }

  /* request: {"argv": [...]}\n */
  size_t cap = 256;
  for (int i = 0; i < nfwd; ++i) cap += 6 * strlen(fwd[i]) + 8;
  char *req = malloc(cap), *esc = malloc(cap);
  strcpy(req, "{\"argv\": [");
  for (int i = 0; i < nfwd; ++i) {
    if (i) strcat(req, ", ");
    strcat(req, jstr(fwd[i], esc));
  }
  strcat(req, "]}\n");
  size_t len = strlen(req), off = 0;
  while (off < len) {
    ssize_t w = write(fd, req + off, len - off);
    if (w <= 0) { perror("bwa-tpu: send"); return 1; }
    off += (size_t)w;
  }

  /* response: JSON status line, then raw payload until EOF */
  char line[4096];
  size_t ln = 0;
  char buf[1 << 16];
  ssize_t r;
  int in_line = 1, rc = 0, saw_err = 0;
  while ((r = read(fd, buf, sizeof buf)) > 0) {
    ssize_t start = 0;
    if (in_line) {
      ssize_t i = 0;
      for (; i < r; ++i) {
        if (buf[i] == '\n') break;
        if (ln + 1 < sizeof line) line[ln++] = buf[i];
      }
      if (i < r) {
        line[ln] = 0;
        in_line = 0;
        start = i + 1;
        if (strstr(line, "\"error\"")) {
          fprintf(stderr, "[daemon] %s\n", line);
          saw_err = 1;
        } else {
          const char *p = strstr(line, "\"ok\":");
          if (p) rc = atoi(p + 5);
        }
      } else {
        continue;
      }
    }
    ssize_t n = r - start, done = 0;
    while (done < n) {
      ssize_t w = write(STDOUT_FILENO, buf + start + done, n - done);
      if (w <= 0) { perror("bwa-tpu: stdout"); return 1; }
      done += w;
    }
  }
  close(fd);
  return saw_err ? 1 : rc;
}
