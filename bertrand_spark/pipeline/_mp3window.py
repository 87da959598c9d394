"""MP3 polyphase window pair — generated data, not spec data.

Produced by tools/mp3_window_design.py (deterministic alternating
least squares over the ISO 11172-3 filterbank STRUCTURE; see
mp3dec._synth_window for the honest-deviation discussion: ISO Table
B.3 itself is unreproducible-from-formula spec table data, so the
decoder ships this self-consistent near-perfect-reconstruction pair
instead).  Measured held-out self-reconstruction SNR: ~50 dB on
noise, tones and sweeps (asserted as a >=45 dB floor in
tests/test_round10.py).  ANALYSIS_WINDOW exists only for the design
script and the round-trip test; the decoder uses SYNTH_WINDOW.
"""

from __future__ import annotations

import base64

import numpy as np

_SYNTH_B64 = (
    "b9y/PW271D17Fb098JKrPTHztD0+U8A9I8KuPalilT090IM9Uzd5PR/2Kz0VslA9"
    "+HYzPafkBD3DljU89G6ROgAAaKeohzo86tg3O/aiCL07Awy9rjZNvV/2DL3xBHe9"
    "cmWPvQsymL1s8qu9AWa+vZQE5L39+8a95UbUvY7NEr79WAq+M5ITvo3+Er7SdS2+"
    "FJ4vvi5oKr6esUS+YNBMvkYpWL7U11K+8BJuvnIhW77mg4C+zMdQvrHTcL6YRlW+"
    "Bj+HvmghW74XsHC+ZItyvsP3gr7wa4W+UauJvk4he76aSIW+ZEN8vtiXgL4kpHC+"
    "R/h0vgHbb74UqFG+t+NSviCvXD4jR2I+eeBZPjk/QT50/UA+OBI/Ppq3Kj6T7xI+"
    "dWHoPft7rD1WDJk9QGraPXN/Vz2jBjU9amYTPVYQJDtwWHKlwlDlvIBHkb35L7y9"
    "X5CvvZI7Hb7oB+29i8UFvkOXO75lYFK+SchsvlX/hr4t55a+lteMvt+xob6XJq2+"
    "gISsvogxsr6X9rq+RIXOvrbTy75rqde+CWPrvvlM+L6LB/y+g7z/vnXy/76STwK/"
    "v5QEv3I9Ab9iGAS/rCgBv6WpC79zk/++SqwFvwgiDb/P6gi/X30PvwpnBr+nFAe/"
    "gO0Gv1nmA7/qDvq+8NbmvgHm176YOdy+v9DGvhjuub7G0bA+Z9mpPpGvnT4QD4U+"
    "Rnt0Po8rTD6eGS0+ms7xPf9FoT3IJJs8IHfFvBW3Hb1E7rq99WAJvizQM76CcIK+"
    "5SXapR9OrL5am9W++uH0vvBIBL+22xW/Ilocv8aOLr+TQ0K/MZlOvxz8Xr+mum2/"
    "nXKCv9I8hb9yGpG/V0uWv8stnr8fP6W/wt2uv8mKt7/aIry/wo7Ev9/Qzr+y0NS/"
    "dvncv9bX4r/RTea/Emvuv+yb97+4/ve/g/L+v8hnAcAMDAXA/EsGwDaZCMDCjAzA"
    "1FUPwC9hEsCJlRHAlq4VwJ16FsB0uRbAWCMZwN7IGcBwqRjABKgawNy1GsBWihnA"
    "yeAaQJjdGkA1VRtAbBgaQGUhGUC+zhdAEgEYQIFqF0DOwBVACCATQAyyEUCpzg9A"
    "31YOQC2fDEAcrw1ATC0IQOyIRKdhSwJAjPf8P4qA/D8ok/Y/iWrxPydS6D/tZ+I/"
    "r9fZP3ZV0j+dVMw/BbnIPwbSvj+h3LY/33quP3vyqT/Wkp8/XiyYPxh5kT82jIg/"
    "XmB+P1Uldz9+UmE/LVtMP9bAQT+g9C8/RzwmP9RQED+oCwI/4/fqPuP5zT5LnbQ+"
    "tzaSPiA0gD7kv1o+iVb7PdEskz0trQM9SySKPFV4jb2BkJ29m8QXvnspJb6Tmz2+"
    "W7GBvi+Ghr4nJJa+L6CrvmYguj4z4cs+V4bQPi253D7EQuM+j+3nPnQk+j73ywQ/"
    "OnwEP/qT/T70VwM/tUj9PouiET83Ng8/jhMWP7LACj+Jp1ClA08LPwDvBD87FQo/"
    "rkIBP37fEz9OGgE/smkDP+jl8z6idOM+czTlPmVk7j6XR+c+LtHQPkgKyj6Yib4+"
    "Rv61Pjqlqz6DHqI+kw+YPgb9hj4UWpE+FKplPg3CSz4QezQ+CyUkPp9yDz7D1b49"
    "LyfkPSj0fT15LEY9ubj5PIbz+jtXmSO8xVTAvC9Wd73fhkm95Xq9vV0mw71ycQG+"
    "tocMvlfKH74HRia+wx8XvqWqO75Pi0i+yHNEvsSZXL5BNmY+1GB0PnSoZj4bKnk+"
    "jKZ4PohggD5MHYo+F9iLPvazhT49BYk+Qjt6PrDGaz61xIY+1qeAPr8Mkj7U+Ik+"
    "2UweJyeygT7pYXI+S/aQPkHtdT4lOpE+mOR1PupBWz4KcGU+R5dbPvTnPD6ZQVA+"
    "cl1RPsykOT6Wbk8+FW8nPrVoEj6AKPY9ABECPkf/Aj6vPMY9N/HUPW2Boz1MOqQ9"
    "iTCePQw0RD0FWD498L2OPKY1Sj0JXbA7uCbjOeTsIbyk03A8CtesvHO9Ab2teia9"
    "0YjCvPGQRr0aS2W99WW7veHYc71kW6K9sCHBvdzLmr0dmNu94lKuvX0ix719ofq9"
    "jifDPSYrzT2+kOs9VADbPR+pvD0/js09/3vdPQsv9z1ka+M9M4PnPVHs0D0ICq89"
    "rNYJPqrS1j2Icgg+ePj7PeNQJ6dSJOs9VoawPf2f+z2jQKw9B6YCPiR/xz2lyNE9"
    "vPDSPaB6uz3Qn6w9+bC8Pa8dyT1AUJI9+vZ5PSWhgz2PWRw9915pPf1ZSD2SkjI9"
    "3ysJPXLcED2EiyY9zPkQPVcszDyzMf88WyupPMhlCTzYqCQ8KXEpPHhdsDxN+dA7"
    "c7yiu606WLqESC280VvIu+ppX7wMsV288aqxvPVNjbzp7+O8dqbRvEtlzbxbbTS9"
    "Vw4RvaA/FL2d8Ay9ZmIJvUu0kTzTsGI7UsgDPO/h/TvkrNY72b3NO7M08jv6Cjc8"
    "8L4gPKsUKDxSShc8FDjTOye2ljznY0Q8rMx/PNb/gjze4Rwnw/uBPF2BIjw4mKo8"
    "mWk0PN5KvTxNaIc8rVJ8POjrWDwe+Wg8B7hDPEduQzwbhpA8gFo4PBp2Wzw9cUM8"
    "pwZaPKPXFDzeIf87W6v2O3wWszufgJI7YjTfOyHKvTsyZYg719K0O/WZgTvsTFM6"
    "yZxiO+VMnTpDmyU786OmOpKzLjqkO6i6hc0tuxqCDrtKMbC6gAf1unPFh7sfJ7y7"
    "1betu4EnpLtu9pm7drLpu1PkIby5Msa7oCX3u19m97s="
)

_ANALYSIS_B64 = (
    "Gtu8uHxP0Lj0lsu4AxzOuEf1wrgcJf641s34uJAsBLkOTum488jQuJXIz7gfjAa5"
    "/+DSuFc93LiFVLa4KT2EuLm727jGiqy4Ckq1uFjZlbh+BaO4E1RZuPCJori+PEO4"
    "lBdhuHbaArg9KaI2NdgfODkmOjfVxyk3tI1EODxzmzhEu5A5tz5sOBlwiDh1uks4"
    "KVWNNxMqjjiuamQ4cFvXN2tb4ba3vCc31hkRNxihkrfVmxc35+JluM5jaLdXKau3"
    "AOCUowbMu7cqOwS4xih9uP0HPLjVSRO4+RU3uHMzSbjjVIa4dlAauOOCALeTCY43"
    "lBiguEv+P7gOoZ+34WituOMbsrm7tE+6nwMwuiVIPLqovlG6JTlDuuvDSrqvVUq6"
    "v1pOutReRrp6MT267RM7ujAQRbpmUCe61ZUIusiE37mdBi26mJALuny+G7ofTb65"
    "p+fxucyK0LleywO6KISGucMcoLnU1pO5UReAuU+ZMrmvqTS5oZ50ufZnCrkwtqS3"
    "vesSOZ4yHLg8LDc4pORaOGGBZzgevnk4MgzrOKlpLDkUMFo5HARuOWFviTl5Jkw5"
    "WOe1OYC1kjm70sQ5mg2wOQAA5qLeg8I51vC5OVzH5Dk9ZKw5QNLaOVU42jlT3dY5"
    "uWLoOeC5xjmngLk5NpmtOTKWvTmzN6A5yQaBOeB3JjlmjhI5TZVXOYmGmjkLLdw4"
    "IbjfOGahQjk4smI4SKUUOJOe+rhb6225qrK7uaZ5abeAYuW5aC5RuaFOprkvHNi5"
    "cYkmuoxHDLqqZEq6qJE7uurOXbqtyYy6nlJyuifgV7qqYou6/RyXut1uq7r77sG6"
    "gv7Yule2u7pRRNC6l1LhutDT4bp5ntW6D37Xuh0D67ov+Oi625rpunYC9rqIffu6"
    "Vgv6umwDArtn6QG78Bvtuth8+7pSrOm6dtDxulwC+roAAHyjSoXqug1J4bpQ1Oi6"
    "Oq3Vul9E0Lrjeca6oZPAurbzrbruTpu6oCKFuryuX7pcNjy64Bsvun7F/rkcMWG5"
    "d2TUuIYTtjgO6Bg50ooOOkKwGzqri2o65hueOmxmzzoI7eI6HQAAO0knGDsUtiI7"
    "eLstO2BcPzuRVFA7jRNjOzLWgjtUKoE7zSKUO9+qoDvGgqc7rae3O3NPvDvRyMU7"
    "EILVO6Se4Dv6XOo7MGHzO2d2Ajzh6AQ8h6ILPIG/ETy3fBY8NaEcPI01ITyo3ig8"
    "f7orPPtxMTxqdzg8Z3Q9PAX2QTzwxUU8+qFLPJXoTTwsD1Q8zrpVPE4JWzw4GWA8"
    "ADAOpGFFZzzaCWg8brVsPMfobjx7MXM8sX52PP6BeDzF2ng8uZp6PBjvfDwS5n48"
    "FNR+PD5DgDwF8n88JC6APMDlgDwgz4A8hiiAPHRlfzx0n388GJx6PGx+ejz2Mnw8"
    "/bJ3PD2tdTwDZnY8TdFvPNJHbjyP2m08X7NvPIpfazykAGU8UWViPF9AWjy0/Vo8"
    "onRVPK5AUDxGR0s8hrhGPL7JPzx+Wj08Dl42PEKSMzzq1DA8slEoPIkGIjzhLyE8"
    "sl4ZPCQUFDxp6g08DC0IPJNqAzzljvk7XlvtO7RK5Dv+Hdc7VufMOwUywTv5o7U7"
    "+WGtO6xUpDtS/5U7ejaNOwAAR6MPp3I7k6pjOy72Sjtb/zU7NOwlO/3xDjud5/s6"
    "Ge7pOv21xTpPsqQ6Pbd/OtODRToWWhk6/OfAOU2b+jiaaBy4ftSbuWQS1bn14By6"
    "fVwauk3SXrp84oW648ePuj2ZqrpvqJO6O6/LuoqJn7oYHdK6rpfhuhpxAbtFlPa6"
    "1+fuuuV7BLvkG/e63PX7un5q2LrJShW783UJuxFoBrvAWAC7mVfputqD/rqm3gO7"
    "hS4EuzcI+LrAE/K6NWfsurzP5botKOa6Cx/aug+o2roIMsG68ubPuhhMv7pgfry6"
    "I2Ovuskrpbog0Jy6f0+CunOVhrpBIYG6oHBpuosxaroAwK6jIg5Cup5jKbp6tiC6"
    "xFYJuhuC5blE6Lq5USmqud5hprklvba5BBFOuYj/TriSjJ+4sRw4uPXzOrgoaho4"
    "LusROVe7OjlkSqo4QA8fOVCJTDmPYeg5fVKgOclbEDm2KSE56Pm3OZQCjDkL8bQ4"
    "B/6XOSIK/zglseo5VX/YOSWHeDkbQL05TcCxOZZMATrG87850/0LOkZuAzplDqU5"
    "x4aaOTy3iDk9UYE50i/tOdCAzTkKgo05b3gEOpEWvDlmCDo5mKM2OS2ePzmcblA5"
    "pSAROa81WDk8Qyg5ef71OIqx/Tj6hTo5UO+qOPbUTril7ec4Fkqytj/cAzhnzjs4"
    "AACIIhX3iTiaE2i1S2Y+t8t707fRwhO46QvMuEyUgriHpmi40acruJrOmLh+vxa5"
    "dXExuZ1F/bh3RjG5GvUIuQYNNbkO1DQ4a51suWS5LLmbm2I47AskuTh9ojhYWf22"
    "twifuE2dBzmm3j64gU3mOEtBkrnyjPE4mpVfuErn6zfRjhe5z8Z3OJVVNjkWegY4"
    "WIDDNyPdmbh06bq3Nv0POTJHS7ilMs04hmb5ONum9bjyiOS3iN3mN82mDDmLHU45"
    "3yUIOVhXOjk43uc402cKOZGoYTlkje44GulPOTLlZjkevVg52Xl5OQadJzmsm2k5"
    "BXFJOZjYbzmTKBc5eTpzOQDAQyMTvoI5eEmTORmNYznqwWE5ZltSOQatdjlTtW45"
    "g+iNObHDfjkPNnM547iqOc/WeznKSYE5sEhfOdf2Tzk="
)


def synth_window() -> np.ndarray:
    return np.frombuffer(
        base64.b64decode("".join(_SYNTH_B64)), dtype=np.float32
    ).astype(np.float64)


def analysis_window() -> np.ndarray:
    return np.frombuffer(
        base64.b64decode("".join(_ANALYSIS_B64)), dtype=np.float32
    ).astype(np.float64)
